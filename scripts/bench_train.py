"""Training throughput (stage 1 / stage 2) on the current backend.

The reference trains with single-node DataParallel and reports no
throughput numbers (SURVEY.md §7 "Training" row); this measures the
TPU-native trainers' step time at production dims so the two-stage
recipe's cost is a documented quantity, not folklore scattered in
quality logs.

    python scripts/bench_train.py --stage 1 --batch 2 --crop 256 --steps 6

Prints one JSON line {"metric": "train_stageN_clips_per_sec", ...}.
Timing includes the host->device batch upload (the trainer's real
operating point) but excludes synthetic-batch generation (pre-built,
alternated so buffer donation never stalls on a reused host array).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, choices=(1, 2), default=1)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--steps", type=int, default=6, help="timed steps")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--stage2_rounds", type=int, default=None)
    p.add_argument("--num_objects", type=int, default=2)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--pipelined", action="store_true",
                   help="steady-state mode: no per-step metrics sync "
                        "(async dispatch overlaps transfers) — the "
                        "main() train loops' operating point")
    p.add_argument("--prefetch", action="store_true",
                   help="with --pipelined: explicit device_put "
                        "double-buffering (engine/prefetch.py; opt-in — "
                        "measured pathological on the tunneled backend)")
    p.add_argument("--uint8", action="store_true",
                   help="uint8 batches + device-side ingest_batch "
                        "normalize (4x fewer upload bytes)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.config.jax_compilation_cache_dir is None:  # don't clobber a host
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.engine.train_stage1 import synthetic_batch

    base = tiny_test_config() if args.tiny else Config()
    train_kw = {"batch_size": args.batch, "crop_size": (args.crop, args.crop)}
    if args.stage2_rounds is not None:
        train_kw["stage2_rounds"] = args.stage2_rounds
    cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, **train_kw))

    if args.stage == 1:
        from cvpr2020_manet_tpu.engine.train_stage1 import Trainer
        trainer = Trainer(cfg)
    else:
        from cvpr2020_manet_tpu.engine.train_stage2 import Stage2Trainer
        trainer = Stage2Trainer(cfg)

    rng = np.random.default_rng(0)
    batches = [synthetic_batch(cfg, rng, num_objects=args.num_objects,
                               random_entry=args.stage == 2,
                               as_uint8=args.uint8)
               for _ in range(2)]

    if args.pipelined:
        import jax as _jax
        if args.prefetch:
            from cvpr2020_manet_tpu.engine.prefetch import (
                prefetch_to_device)
            stream = prefetch_to_device(
                (batches[i % 2] for i in range(args.warmup + args.steps)),
                trainer.batch_shardings)
        else:
            stream = (batches[i % 2]
                      for i in range(args.warmup + args.steps))
        metrics = None
        for i in range(args.warmup):
            metrics = trainer.train_step(next(stream), sync=False)
        if metrics is not None:
            _jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for batch in stream:
            metrics = trainer.train_step(batch, sync=False)
        metrics = _jax.device_get(metrics)  # drain the async queue
        dt = (time.perf_counter() - t0) / args.steps
    else:
        for i in range(args.warmup):
            metrics = trainer.train_step(batches[i % 2])
        t0 = time.perf_counter()
        for i in range(args.steps):
            metrics = trainer.train_step(batches[i % 2])  # device_get syncs
        dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": f"train_stage{args.stage}_clips_per_sec",
        "value": round(args.batch / dt, 2),
        "unit": "clips/s",
        "ms_per_step": round(1000 * dt, 1),
        "batch": args.batch,
        "crop": args.crop,
        "stage2_rounds": cfg.train.stage2_rounds if args.stage == 2 else None,
        "pipelined": args.pipelined,
        "uint8": args.uint8,
        "devices": len(jax.devices()),
        "final_loss": round(float(metrics["loss"]), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
