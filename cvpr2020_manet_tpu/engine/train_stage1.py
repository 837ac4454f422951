"""Stage-1 training: encoder + propagation (+ interaction head, jointly)
(SURVEY.md §4.3, ref:train_stage1.py expected).

Reference recipe: sample (reference frame, previous frame, current frame)
triplets per object from DAVIS-2017 train; the reference frame's GT mask
stands in for a round-0 interaction; propagate to the current frame with
teacher-forced previous mask; bootstrapped CE; SGD + poly LR; single-node
DataParallel + SyncBN.

TPU-native: ONE jitted, mesh-sharded train step — batch sharded over the
'data' axis (NamedSharding), params replicated; XLA inserts the gradient
all-reduce over ICI. No DataParallel wrapper, no SyncBN machinery (default
GroupNorm; `norm='syncbn'` composes with a shard_map'd step instead).

Run as a script for a synthetic-data smoke train:
    python -m cvpr2020_manet_tpu.engine.train_stage1 --steps 20 --synthetic
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import Config
from cvpr2020_manet_tpu.engine.losses import (
    bootstrap_ratio_schedule, bootstrapped_cross_entropy)
from cvpr2020_manet_tpu.engine.train_state import TrainState
from cvpr2020_manet_tpu.models.layers import resize_bilinear
from cvpr2020_manet_tpu.models.manet import MANet
from cvpr2020_manet_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicated_sharding)


def _downsample_onehot(labels: jax.Array, stride: int, o: int) -> jax.Array:
    """(H, W) int -> (H/s, W/s, O) one-hot via nearest subsampling."""
    sub = labels[stride // 2::stride, stride // 2::stride]
    return jax.nn.one_hot(sub, o, dtype=jnp.float32)


def ingest_batch(batch):
    """Device-side batch ingest (traced inside the jit step).

    uint8 images -> ImageNet-normalized f32, sub-int32 labels -> int32:
    the host pipeline can then ship 4x fewer image bytes (and 4x fewer
    label bytes) over the host->device link — the trainer-side
    counterpart of the serving engines' uint8 ingest
    (propagate_batch.preprocess_frames, streaming uint8 path). Float
    batches pass through unchanged, so both feeds compile to the same
    tail graph.
    """
    from cvpr2020_manet_tpu.engine.propagate_batch import preprocess_frames
    out = dict(batch)
    if batch["images"].dtype == jnp.uint8:
        out["images"] = preprocess_frames(batch["images"])
    if batch["labels"].dtype != jnp.int32:
        out["labels"] = batch["labels"].astype(jnp.int32)
    return out


def encode_batch(model: MANet, params, images: jax.Array,
                 remat_chunk: int = 0):
    """Batched encoder over ALL frames of ALL samples.

    images (B, T, H, W, 3) -> feat (B, T, h, w, Cf), emb (B, T, h, w, Ce).

    The B*T frames run as ONE conv batch: the R101's ~300 (fwd+bwd) ops
    dispatch once for the whole device batch instead of once per sample
    under the old per-sample lax.map (profiled at 46k op executions /
    182 ms device per batch-2 step, dominated by per-op overhead — see
    docs/BENCHMARKS.md training table). When `remat_chunk` > 0 the flat
    frame batch is processed in checkpointed chunks of ~that many frames
    (largest divisor), so the backward's recompute materializes at most
    one chunk of encoder activations (a 23.6G OOM at 12 frames @416^2
    on a 15.75G v5e otherwise).
    """
    b, t = images.shape[:2]
    n = b * t
    flat = images.reshape((n,) + images.shape[2:])

    def enc(x):
        return model.apply({"params": params}, x,
                           method=model.extract_features)

    if remat_chunk > 0:
        chunk = next(c for c in range(min(remat_chunk, n), 0, -1)
                     if n % c == 0)
        if chunk < n:
            stacked = flat.reshape((n // chunk, chunk) + flat.shape[1:])
            feat, emb = jax.lax.map(jax.checkpoint(enc), stacked)
            feat = feat.reshape((n,) + feat.shape[2:])
            emb = emb.reshape((n,) + emb.shape[2:])
        else:
            feat, emb = jax.checkpoint(enc)(flat)
    else:
        feat, emb = enc(flat)
    unflat = lambda a: a.reshape((b, t) + a.shape[1:])
    return unflat(feat), unflat(emb)


def forward_sample(model: MANet, params, images, labels, obj_valid, cfg,
                   gmap_fn=None, feat_emb=None):
    """Loss for ONE triplet sample.

    images (3, H, W, 3) float; labels (3, H, W) int (0 = background);
    obj_valid (O,).  Frames: [reference, previous, current].
    gmap_fn(query (Nq,C), ref (Nk,C), ref_onehot (Nk,O)) -> (Nq, O):
    optional external global matching (e.g. context-parallel).
    feat_emb: optional precomputed (feat (3,h,w,Cf), emb (3,h,w,Ce)) from
    `encode_batch` — the trainers hoist the encoder out of the per-sample
    lax.map so it runs batched; `images` may then be None.
    """
    mcfg = cfg.model
    o = mcfg.max_objects + 1
    s = mcfg.feature_stride
    h, w = labels.shape[1:3]
    variables = {"params": params}

    if feat_emb is None:
        feat, emb = model.apply(variables, images,
                                method=model.extract_features)
    else:
        feat, emb = feat_emb
    ref_oh = _downsample_onehot(labels[0], s, o)
    prev_oh = _downsample_onehot(labels[1], s, o)

    # Round-0 interaction simulated by the reference-frame GT mask
    # (SURVEY.md §4.3: "GT of ref as round-0 interaction").
    pos = ref_oh * obj_valid[None, None, :]
    scribbled = jnp.max(pos, axis=-1, keepdims=True)
    neg = (scribbled - pos) * obj_valid[None, None, :]
    bg_prior = jnp.zeros_like(ref_oh).at[..., 0].set(1.0)
    int_feats, int_logits = model.apply(
        variables, feat[0], pos, neg, bg_prior, method=model.interact)
    int_mem = model.apply(variables, int_feats,
                          jnp.zeros_like(int_feats), True,
                          method=model.aggregate_memory)

    gmap_override = None
    if gmap_fn is not None:
        gmap_override = gmap_fn(
            emb[2].reshape(-1, emb.shape[-1]),
            emb[0].reshape(-1, emb.shape[-1]),
            ref_oh.reshape(-1, o)).reshape(h // s, w // s, o)
    prop_logits, _ = model.apply(
        variables, feat[2], emb[2],
        emb[0].reshape(-1, emb.shape[-1]), ref_oh.reshape(-1, o), None,
        jnp.ones((h // s, w // s, o), jnp.float32),
        emb[1], prev_oh, int_mem, obj_valid,
        method=model.propagate, gmap_override=gmap_override)

    int_up = resize_bilinear(int_logits, (h, w))
    prop_up = resize_bilinear(prop_logits, (h, w))
    return int_up, prop_up


def make_cp_train_step(model: MANet, cfg: Config, mesh):
    """FULL training step shard_map'd over a ('data', 'context') mesh.

    Batch sharded over 'data' (DP), reference pixels of the global matching
    sharded over 'context' (SP/CP: each member computes partial min maps
    over its shard, combined with all_gather + min — differentiable through
    the hard min). Gradients pmean over both axes ride ICI.
    Returns step(state, batch) -> (state, metrics), already jitted.
    """
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cvpr2020_manet_tpu.parallel.cp_matching import local_then_min

    tcfg = cfg.train

    def gmap_fn(query, ref, ref_onehot):
        ctx = jax.lax.axis_size("context")
        idx = jax.lax.axis_index("context")
        nk = ref.shape[0]
        shard = nk // ctx
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * shard, shard, 0)
        return local_then_min(query, sl(ref), sl(ref_onehot),
                              jnp.ones((shard,), jnp.float32), "context")

    def per_device(params, step, batch):
        batch = ingest_batch(batch)

        def loss_fn(params):
            ratio = bootstrap_ratio_schedule(
                step, tcfg.bootstrap_warmup_steps, tcfg.bootstrap_ratio)
            feat, emb = encode_batch(
                model, params, batch["images"],
                tcfg.remat_chunk if tcfg.remat else 0)
            o = cfg.model.max_objects + 1
            s = cfg.model.feature_stride

            def per_sample(feat_s, emb_s, labels, obj_valid):
                # CP matching hoisted out of the remat region (see
                # make_train_step): the shard_map collectives + kernel run
                # once in the forward, not again in the backward recompute
                ce = emb_s.shape[-1]
                ref_oh = _downsample_onehot(labels[0], s, o)
                gm = gmap_fn(emb_s[2].reshape(-1, ce),
                             emb_s[0].reshape(-1, ce),
                             ref_oh.reshape(-1, o))

                def tail(feat_s, emb_s, gm, labels, obj_valid):
                    int_up, prop_up = forward_sample(
                        model, params, None, labels, obj_valid, cfg,
                        gmap_fn=lambda *_: gm, feat_emb=(feat_s, emb_s))
                    l_int = bootstrapped_cross_entropy(
                        int_up, labels[0], ratio)
                    l_prop = bootstrapped_cross_entropy(
                        prop_up, labels[2], ratio)
                    return l_prop + 0.5 * l_int

                tail_fn = jax.checkpoint(tail) if tcfg.remat else tail
                return tail_fn(feat_s, emb_s, gm, labels, obj_valid)

            return jnp.mean(jax.lax.map(
                lambda xs: per_sample(*xs),
                (feat, emb, batch["labels"], batch["obj_valid"])))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(jax.lax.pmean(grads, "data"), "context")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "data"), "context")
        return loss, grads

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), {"images": P("data"), "labels": P("data"),
                             "obj_valid": P("data"),
                             "frame_valid": P("data")}),
        out_specs=(P(), P()),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch):
        loss, grads = sharded(state.params, state.step, batch)
        return state.apply_gradients(grads), {"loss": loss}

    return step_fn


def make_train_step(model: MANet, cfg: Config):
    tcfg = cfg.train

    def loss_fn(params, batch, step):
        batch = ingest_batch(batch)
        ratio = bootstrap_ratio_schedule(
            step, tcfg.bootstrap_warmup_steps, tcfg.bootstrap_ratio)
        # Encoder hoisted out of the per-sample map: all B*3 frames as one
        # (chunk-rematted) conv batch — see encode_batch.
        feat, emb = encode_batch(model, params, batch["images"],
                                 tcfg.remat_chunk if tcfg.remat else 0)

        o = cfg.model.max_objects + 1
        s = cfg.model.feature_stride

        def per_sample(feat_s, emb_s, labels, obj_valid):
            # Global matching hoisted OUT of the remat region: the kernel
            # runs once in the forward; the checkpointed tail receives the
            # small (Nq, O) map as an INPUT (remat saves inputs), so the
            # backward recompute never reruns the kernel — gradients
            # re-enter it via its custom VJP's stored argmin residuals.
            ce = emb_s.shape[-1]
            ref_oh = _downsample_onehot(labels[0], s, o)
            gm = model._global_matching(
                emb_s[2].reshape(-1, ce), emb_s[0].reshape(-1, ce),
                ref_oh.reshape(-1, o), None)

            def tail(feat_s, emb_s, gm, labels, obj_valid):
                int_up, prop_up = forward_sample(
                    model, params, None, labels, obj_valid, cfg,
                    gmap_fn=lambda *_: gm, feat_emb=(feat_s, emb_s))
                l_int = bootstrapped_cross_entropy(int_up, labels[0], ratio)
                l_prop = bootstrapped_cross_entropy(prop_up, labels[2],
                                                    ratio)
                return l_prop + 0.5 * l_int, (l_prop, l_int)

            # remat: without it the map's backward stores every sample's
            # tail activations simultaneously (OOM risk at prod crop)
            tail_fn = jax.checkpoint(tail) if tcfg.remat else tail
            return tail_fn(feat_s, emb_s, gm, labels, obj_valid)

        # The matching/head/loss tail stays a lax.map, not vmap, over the
        # per-device batch: the Pallas matching kernels
        # (trainable_matching path) use manually-DMA'd ANY-memory-space
        # operands that Mosaic cannot batch under vmap.
        (loss, (l_prop, l_int)) = jax.tree_util.tree_map(
            jnp.mean,
            jax.lax.map(lambda xs: per_sample(*xs),
                        (feat, emb, batch["labels"],
                         batch["obj_valid"])))
        return loss, {"loss": loss, "loss_prop": l_prop, "loss_int": l_int}

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, state.step)
        return state.apply_gradients(grads), metrics

    return train_step


class Trainer:
    """Mesh-sharded stage-1 trainer (DP over the 'data' axis)."""

    def __init__(self, cfg: Config, mesh=None, seed: int | None = None,
                 matching_backend: str = "auto"):
        self.cfg = cfg
        if mesh is None:
            # data axis = largest device count that divides the batch
            n = len(jax.devices())
            data = next(d for d in range(min(n, cfg.train.batch_size), 0, -1)
                        if cfg.train.batch_size % d == 0)
            mesh = create_mesh(data=data, context=1)
        self.mesh = mesh
        # "auto": jnp oracle on CPU, the custom-VJP Pallas kernels on TPU —
        # training exercises the same kernels the eval path ships. Pass
        # matching_backend="jnp" explicitly when the resolved default
        # backend does not match the mesh's devices (e.g. a CPU-mesh dry
        # run in a process whose default backend is the TPU).
        self.model = MANet(cfg.model, matching_backend=matching_backend,
                           trainable_matching=True)
        h, w = cfg.train.crop_size
        o = cfg.model.max_objects + 1
        rng = jax.random.PRNGKey(cfg.train.seed if seed is None else seed)
        variables = jax.jit(self.model.init)(
            rng, jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h // 4, w // 4, o)),
            jnp.zeros((1, h // 4, w // 4, o)))
        self.state = TrainState.create(variables["params"], cfg.train)

        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        self.state = jax.device_put(self.state, repl)
        # exposed for prefetch_to_device in the train loops / benches
        self.batch_shardings = {"images": data, "labels": data,
                                "obj_valid": data, "frame_valid": data}
        self._step = jax.jit(
            make_train_step(self.model, cfg),
            in_shardings=(repl, self.batch_shardings),
            out_shardings=(repl, repl),
            donate_argnums=(0,))

    def train_step(self, batch: Dict[str, np.ndarray], sync: bool = True):
        """One optimizer step. sync=False returns device-resident metrics
        (no host round-trip): the loop stays async and only materializes
        metrics at log points — see main()."""
        self.state, metrics = self._step(self.state, batch)
        return jax.device_get(metrics) if sync else metrics


def synthetic_batch(cfg: Config, rng: np.random.Generator,
                    num_objects: int | None = None,
                    random_entry: bool = False,
                    as_uint8: bool = False,
                    batch_size: int | None = None) -> Dict[str, np.ndarray]:
    """Random moving-square triplets (smoke training / tests).

    num_objects: objects per clip (default 2, capped by the bucket).
    random_entry: sample each object's first-visible frame uniformly over
    the clip — the model then TRAINS on objects that enter mid-clip
    (absent from the reference frame), matching YouTube-VOS dynamics and
    the entry-frames eval task (scripts/train_eval_flagship.py).
    as_uint8: emit raw uint8 images + uint8 labels for the trainers'
    device-side ingest path (ingest_batch) — 4x fewer upload bytes.
    batch_size: override cfg.train.batch_size (multi-host: the PER-PROCESS
    share of the global batch — parallel/distributed.local_batch_size)."""
    from cvpr2020_manet_tpu.data.synthetic import SyntheticDataset
    b = cfg.train.batch_size if batch_size is None else batch_size
    h, w = cfg.train.crop_size
    o = cfg.model.max_objects + 1
    n_obj = (min(2, cfg.model.max_objects) if num_objects is None
             else min(num_objects, cfg.model.max_objects))
    images = np.empty((b, 3, h, w, 3), np.float32)
    labels = np.empty((b, 3, h, w), np.int32)
    for i in range(b):
        entry = ([int(e) for e in rng.integers(0, 3, size=n_obj)]
                 if random_entry else None)
        ds = SyntheticDataset(image_size=(h, w), num_frames=3,
                              num_sequences=1, num_objects=n_obj,
                              seed=int(rng.integers(1 << 30)),
                              entry_frames=entry)
        seq = ds.sequences()[0]
        images[i] = ds.images(seq)
        labels[i] = ds.gt_masks(seq)
    obj_valid = np.zeros((b, o), np.float32)
    obj_valid[:, :n_obj + 1] = 1.0
    if as_uint8:
        from cvpr2020_manet_tpu.data.davis import (IMAGENET_MEAN,
                                                   IMAGENET_STD)
        images = np.clip((images * IMAGENET_STD + IMAGENET_MEAN) * 255.0,
                         0, 255).astype(np.uint8)
        labels = labels.astype(np.uint8)
    return {"images": images, "labels": labels, "obj_valid": obj_valid,
            "frame_valid": np.ones((b, 3), np.float32)}


def add_train_override_args(p) -> None:
    """Flagship-dims overrides shared by both trainer CLIs (the measured
    single-chip sweet spots live in docs/BENCHMARKS.md's training table;
    TrainConfig holds the reference-recipe defaults)."""
    p.add_argument("--batch", type=int, default=None,
                   help="global batch size (TrainConfig.batch_size)")
    p.add_argument("--crop", type=int, default=None,
                   help="square crop size (stage 2 at crop 416 x 3 "
                        "simulated rounds OOMs a 16G chip; use ~192)")
    p.add_argument("--total_steps", type=int, default=None,
                   help="poly-LR horizon (TrainConfig.total_steps)")
    p.add_argument("--checkpoint_every", type=int, default=None)
    p.add_argument("--objects", type=int, default=None,
                   help="objects per synthetic clip")
    p.add_argument("--random_entry", action="store_true",
                   help="synthetic objects enter mid-clip "
                        "(entering-object churn; see synthetic_batch)")
    p.add_argument("--release", default=None,
                   help="dir to export an immutable release checkpoint "
                        "of the final params")


def apply_train_overrides(cfg: Config, args) -> Config:
    import dataclasses
    tr = {}
    if args.batch is not None:
        tr["batch_size"] = args.batch
    if args.crop is not None:
        tr["crop_size"] = (args.crop, args.crop)
    if args.total_steps is not None:
        tr["total_steps"] = args.total_steps
    if args.checkpoint_every is not None:
        tr["checkpoint_every"] = args.checkpoint_every
    if tr:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **tr))
    return cfg


def export_release_if_requested(args, trainer, proc: int) -> None:
    if args.release and proc == 0:
        from cvpr2020_manet_tpu.utils.checkpoint import export_release
        export_release(jax.device_get(trainer.state.params), args.release)
        print(f"release exported to {args.release}", flush=True)


def main(argv=None):
    from cvpr2020_manet_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import argparse
    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.utils.logging import MetricLogger
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    add_train_override_args(p)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--davis_root", default=None,
                   help="train on DAVIS (data/davis.py) instead of synthetic")
    p.add_argument("--grain", action="store_true",
                   help="multiprocess grain input pipeline "
                        "(data/grain_pipeline.py; requires --davis_root)")
    p.add_argument("--grain_workers", type=int, default=4)
    p.add_argument("--shard_index", type=int, default=0,
                   help="per-host data shard (grain path; multi-host DP)")
    p.add_argument("--shard_count", type=int, default=1)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD: join the jax.distributed process "
                        "group (parallel/distributed.py). batch_size is the "
                        "GLOBAL batch; this process feeds its share. "
                        "Coordinator/ranks from --coordinator/--num_processes/"
                        "--process_id, MANET_* env vars, or TPU-pod "
                        "auto-detection")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--uint8", action="store_true",
                   help="ship raw uint8 batches; normalize on device "
                        "(ingest_batch) — 4x fewer upload bytes")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--snapshot_dir", default=None,
                   help="orbax checkpoint dir (resumes if it has snapshots)")
    args = p.parse_args(argv)

    from cvpr2020_manet_tpu.parallel import distributed as dist
    proc, nproc = 0, 1
    if args.distributed:
        proc, nproc = dist.initialize(args.coordinator, args.num_processes,
                                      args.process_id)

    cfg = apply_train_overrides(
        tiny_test_config() if args.tiny else Config(), args)
    local_bs = dist.local_batch_size(cfg.train.batch_size)
    trainer = Trainer(cfg)
    # one metrics stream per job: non-zero ranks train silently (their
    # state is bitwise-identical to rank 0's — replicated params, global
    # batch); orbax checkpointing is itself multihost-aware, so mgr calls
    # stay on every rank.
    logger = MetricLogger(args.log_dir if proc == 0 else None,
                          quiet=proc != 0)

    mgr = None
    if args.snapshot_dir:
        from cvpr2020_manet_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.snapshot_dir)
        if mgr.latest_step() is not None:
            trainer.state = mgr.restore(trainer.state)
            if proc == 0:
                print(f"resumed from step {int(trainer.state.step)}")

    # multi-host: each rank loads a distinct data shard of its local
    # batch size; shard_host_batch assembles the global array per step.
    shard_index, shard_count = args.shard_index, args.shard_count
    if args.distributed and shard_count == 1:
        shard_index, shard_count = proc, nproc
    if args.grain:
        assert args.davis_root, "--grain requires --davis_root"
        from cvpr2020_manet_tpu.data.grain_pipeline import make_train_iterator
        it = make_train_iterator(
            args.davis_root, cfg, num_workers=args.grain_workers,
            seed=cfg.train.seed, shard_index=shard_index,
            shard_count=shard_count, emit_uint8=args.uint8,
            batch_size=local_bs)
        next_batch = lambda: next(it)
    elif args.davis_root:
        from cvpr2020_manet_tpu.data.davis import DavisTrainDataset
        ds = DavisTrainDataset(
            args.davis_root, cfg, seed=cfg.train.seed + shard_index,
            emit_uint8=args.uint8,
            shard=((shard_index, shard_count) if shard_count > 1 else None))
        next_batch = lambda: ds.batch(local_bs)
    else:
        rng = np.random.default_rng(cfg.train.seed + shard_index)
        next_batch = lambda: synthetic_batch(
            cfg, rng, num_objects=args.objects,
            random_entry=args.random_entry, as_uint8=args.uint8,
            batch_size=local_bs)
    if args.distributed:
        base_feed = next_batch
        next_batch = lambda: dist.shard_host_batch(
            base_feed(), trainer.batch_shardings)

    start = int(trainer.state.step)
    # synchronous numpy feed on purpose: on the tunneled backend both
    # device_put prefetch and unsynced async dispatch chains measured
    # 10-100x SLOWER than this (docs/BENCHMARKS.md training section);
    # train_step(..., sync=False) + engine/prefetch.py are the opt-in
    # pipeline for real multi-host pods.
    for step in range(start, start + args.steps):
        metrics = trainer.train_step(next_batch())
        if step % max(1, cfg.train.log_every // 10) == 0:
            logger.write(step, metrics)
        if mgr is not None and (step + 1) % cfg.train.checkpoint_every == 0:
            mgr.save(trainer.state)
    if mgr is not None:
        mgr.save(trainer.state)
    export_release_if_requested(args, trainer, proc)
    logger.flush()


if __name__ == "__main__":
    main()
