"""Worker for tests/test_distributed.py: one rank of a 2-process CPU
train job. Prints LOSS/PARAMHASH lines the test asserts on.

Run: python tests/_distributed_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from cvpr2020_manet_tpu.parallel import distributed as dist
    proc, count = dist.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert (proc, count) == (pid, nproc), (proc, count)

    import numpy as np
    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.engine.train_stage1 import (Trainer,
                                                        synthetic_batch)

    cfg = tiny_test_config()
    trainer = Trainer(cfg, matching_backend="jnp")
    local_bs = dist.local_batch_size(cfg.train.batch_size)
    assert local_bs == cfg.train.batch_size // nproc

    # distinct per-rank data shards — the global batch differs per rank,
    # the replicated state after pmean'd gradients must not.
    rng = np.random.default_rng(1000 + pid)
    for _ in range(2):
        batch = synthetic_batch(cfg, rng, batch_size=local_bs)
        gbatch = dist.shard_host_batch(batch, trainer.batch_shardings)
        metrics = trainer.train_step(gbatch)
    print(f"LOSS {float(metrics['loss']):.9f}", flush=True)

    import hashlib

    def param_hash(params):
        digest = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(params):
            digest.update(np.asarray(leaf).tobytes())
        return digest.hexdigest()

    print(f"PARAMHASH {param_hash(trainer.state.params)}", flush=True)

    # orbax under jax.distributed: every rank calls save/restore on the
    # same (shared-fs) dir with the same step — orbax coordinates the
    # writes internally. The restored state must match what was saved.
    snap_dir = sys.argv[4] if len(sys.argv) > 4 else None
    if snap_dir:
        from cvpr2020_manet_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(snap_dir)
        mgr.save(trainer.state)
        fresh = Trainer(cfg, matching_backend="jnp")
        restored = mgr.restore(fresh.state)
        assert int(restored.step) == int(trainer.state.step)
        print(f"RESTOREHASH {param_hash(restored.params)}", flush=True)


if __name__ == "__main__":
    main()
