"""Stage-2 training: interaction branch + memory aggregation
(SURVEY.md §4.4, ref:train_stage2.py expected).

Reference recipe: per sample, simulate R interaction rounds — synthesize
scribbles from GT / error regions (SURVEY.md C16), refresh the annotated
frame through the interaction branch, fuse interaction features into the
running memory (the MA module under training), propagate to the clip's
frames, and take losses on every round so the gate learns to integrate
corrections across rounds.

TPU-native deltas from the reference:
- the WHOLE multi-round simulation is one jitted graph: rounds are a
  `lax.scan` carrying (predictions, interaction memory); no host
  round-trips mid-sample.
- scribble synthesis is device-side: the worst frame is picked by soft
  IoU, and "scribbles" are line strokes through the densest error blobs
  of each object (including background-correction strokes over false
  positives) — the jittable stand-in for the robot's skeleton polylines.
  The eval-time robot (interactive/robot.py) stays host-side and
  polyline-based.

Run: python -m cvpr2020_manet_tpu.engine.train_stage2 --tiny --steps 5
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import Config
from cvpr2020_manet_tpu.engine.losses import (
    bootstrap_ratio_schedule, bootstrapped_cross_entropy)
from cvpr2020_manet_tpu.engine.train_state import TrainState
from cvpr2020_manet_tpu.engine.train_stage1 import (
    _downsample_onehot, encode_batch, ingest_batch, synthetic_batch)
from cvpr2020_manet_tpu.models.layers import resize_bilinear
from cvpr2020_manet_tpu.models.manet import MANet
from cvpr2020_manet_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicated_sharding)

STROKES_PER_OBJECT = 2   # line strokes synthesized per object per round


def _soft_iou_per_frame(probs, gt_onehot, obj_valid):
    """(F, h, w, O) x (F, h, w, O) -> (F,) mean soft IoU over live objects."""
    inter = jnp.sum(probs * gt_onehot, axis=(1, 2))
    union = jnp.sum(probs + gt_onehot - probs * gt_onehot, axis=(1, 2))
    iou = inter / jnp.maximum(union, 1e-6)                    # (F, O)
    w = obj_valid[None, :]
    return jnp.sum(iou * w, axis=1) / jnp.maximum(jnp.sum(w), 1e-6)


def _synthesize_scribbles(key, gt_oh, pred_labels, obj_valid):
    """Device-side robot stand-in: spatially coherent line strokes through
    each object's error region — the jittable analogue of the eval robot's
    skeleton polylines (interactive/robot.py).

    Per object channel (channel 0 = background, i.e. negative/correction
    strokes over other objects' false positives — the `gt==0 & pred!=0`
    form the eval robot produces): find the densest false-negative blob
    (box-filtered error), draw a short line segment through it at a random
    angle, keep only pixels inside the error region. Repeated
    STROKES_PER_OBJECT times with the previous strokes' neighborhood
    suppressed, so multiple error blobs get covered.

    gt_oh (h, w, O) one-hot GT of the annotated frame; pred_labels (h, w).
    Returns (pos (h, w, O), neg (h, w, O)).
    """
    h, w, o = gt_oh.shape
    pred_oh = jax.nn.one_hot(pred_labels, o, dtype=jnp.float32)
    err = gt_oh * (1.0 - pred_oh)                  # false negatives per object
    half_len = jnp.float32(max(h, w) / 3.0)

    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    def one_stroke(e, density, kk):
        """e (h, w) error mask; density (h, w) box-filtered error."""
        k_seed, k_ang = jax.random.split(kk)
        # jitter breaks ties between equally dense blobs across rounds
        jit = jax.random.uniform(k_seed, density.shape, maxval=0.01)
        seed = jnp.argmax((density + jit) * (e > 0))
        sy = (seed // w).astype(jnp.float32)
        sx = (seed % w).astype(jnp.float32)
        theta = jax.random.uniform(k_ang, maxval=jnp.pi)
        dy, dx = yy - sy, xx - sx
        along = dy * jnp.sin(theta) + dx * jnp.cos(theta)
        perp = dy * jnp.cos(theta) - dx * jnp.sin(theta)
        line = (jnp.abs(perp) <= 0.75) & (jnp.abs(along) <= half_len)
        return line.astype(jnp.float32) * e

    def strokes_for_object(e, kk):
        density = jax.lax.reduce_window(
            e, 0.0, jax.lax.add, (5, 5), (1, 1), "SAME")

        def body(carry, k_i):
            acc, dens = carry
            s = one_stroke(e, dens, k_i)
            # suppress the covered blob so the next stroke lands elsewhere
            cover = jax.lax.reduce_window(
                s, 0.0, jax.lax.add, (7, 7), (1, 1), "SAME")
            return (jnp.maximum(acc, s),
                    jnp.where(cover > 0, 0.0, dens)), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros_like(e), density),
            jax.random.split(kk, STROKES_PER_OBJECT))
        return acc

    keys = jax.random.split(key, o)
    pos = jax.vmap(strokes_for_object, in_axes=(-1, 0), out_axes=-1)(
        err, keys)
    pos = pos * obj_valid[None, None, :]
    scribbled = jnp.max(pos, axis=-1, keepdims=True)
    neg = (scribbled - pos) * obj_valid[None, None, :]
    return pos, neg


def forward_sample_stage2(model: MANet, params, images, labels, obj_valid,
                          cfg: Config, key, frame_valid=None,
                          feat_emb=None):
    """Multi-round simulated interaction on one clip.

    images (F, H, W, 3); labels (F, H, W); frame_valid (F,) {0,1} — padded
    frames (clips shorter than clip_len) are excluded from the worst-frame
    pick; the caller drops their loss. Returns per-round logits.
    feat_emb: optional precomputed (feat, emb) from
    `train_stage1.encode_batch` (batched-encoder hoist; `images` may then
    be None).
    """
    mcfg = cfg.model
    o = mcfg.max_objects + 1
    s = mcfg.feature_stride
    f, h, w = labels.shape
    hh, ww = h // s, w // s
    variables = {"params": params}
    rounds = cfg.train.stage2_rounds

    if feat_emb is None:
        feat, emb = model.apply(variables, images,
                                method=model.extract_features)
    else:
        feat, emb = feat_emb
    gt_oh = jax.vmap(lambda l: _downsample_onehot(l, s, o))(labels)  # (F,hh,ww,O)
    gt_oh = gt_oh * obj_valid[None, None, None, :]

    init_probs = jnp.zeros((f, hh, ww, o)).at[..., 0].set(1.0)
    init_mem = jnp.zeros((o, hh, ww, mcfg.ma_channels), jnp.float32)
    # per-frame global-map min-fusion memory across simulated rounds
    # (TrainConfig.stage2_gmap_memory): ones = "no match yet", exactly the
    # evaluator's cross-round C8 state
    init_gmap = jnp.ones((f, hh, ww, o), jnp.float32)

    fv = (jnp.ones((f,), jnp.float32) if frame_valid is None
          else frame_valid.astype(jnp.float32))

    def round_step(carry, xs):
        probs, int_mem, gmap = carry
        r, key_r = xs
        # worst frame by soft IoU (on-device robot: frame selection);
        # padded frames can never be picked as the annotated frame
        iou = _soft_iou_per_frame(probs, gt_oh, obj_valid)
        a = jnp.argmin(jnp.where(fv > 0, iou, jnp.inf))
        gt_a = jnp.take(gt_oh, a, axis=0)
        pred_a = jnp.argmax(jnp.take(probs, a, axis=0), axis=-1)
        pos, neg = _synthesize_scribbles(key_r, gt_a, pred_a, obj_valid)

        f_a = jnp.take(feat, a, axis=0)
        int_feats, int_logits = model.apply(
            variables, f_a, pos, neg, jnp.take(probs, a, axis=0),
            method=model.interact)
        int_mem = model.apply(variables, int_feats, int_mem, r == 0,
                              method=model.aggregate_memory)

        # matching reference: GT labels of the annotated frame (the
        # interaction is simulated from GT, so GT is the consistent label)
        ref_emb = jnp.take(emb, a, axis=0).reshape(-1, emb.shape[-1])
        ref_oh_flat = gt_a.reshape(-1, o)

        def prop_frame(t):
            prev = jnp.clip(t - 1, 0, f - 1)
            g_prev = (gmap[t] if cfg.train.stage2_gmap_memory
                      else jnp.ones((hh, ww, o), jnp.float32))
            logits, g_new = model.apply(
                variables, feat[t], emb[t], ref_emb, ref_oh_flat, None,
                g_prev,
                jnp.take(emb, prev, axis=0), jnp.take(probs, prev, axis=0),
                int_mem, obj_valid, method=model.propagate)
            return logits, g_new

        # lax.map (vmap cannot batch the DMA'd Pallas matching kernels)
        logits, g_all = jax.lax.map(prop_frame, jnp.arange(f))  # (F,hh,ww,O)
        if cfg.train.stage2_gmap_memory:
            gmap = g_all   # min-fused inside propagate (C8 semantics)
        # the annotated frame keeps its interaction-branch refresh
        int_l = int_logits + (1.0 - obj_valid)[None, None, :] * (-1e9)
        logits = logits.at[a].set(int_l)
        new_probs = jax.nn.softmax(
            logits + (1.0 - obj_valid)[None, None, None, :] * (-1e9), -1)
        return (new_probs, int_mem, gmap), logits

    keys = jax.random.split(key, rounds)
    # remat each simulated round: the R-round scan otherwise holds every
    # round's full activation set for the backward pass — crop 256 x 3
    # rounds exceeds a 16G v5e (17.7G requested); recomputing the round
    # forward during backprop trades ~1/3 more FLOPs for R x less
    # activation memory (SURVEY.md §8 / brief: jax.checkpoint)
    (_, _, _), logits_rounds = jax.lax.scan(
        jax.checkpoint(round_step), (init_probs, init_mem, init_gmap),
        (jnp.arange(rounds), keys))                        # (R, F, hh, ww, O)

    up = jax.vmap(jax.vmap(lambda l: resize_bilinear(l, (h, w))))(
        logits_rounds)                                     # (R, F, H, W, O)
    return up


def make_train_step(model: MANet, cfg: Config):
    tcfg = cfg.train

    def loss_fn(params, batch, step, key):
        batch = ingest_batch(batch)
        ratio = bootstrap_ratio_schedule(
            step, tcfg.bootstrap_warmup_steps, tcfg.bootstrap_ratio)

        # Encoder hoisted out of the per-sample map: all B*F frames as
        # one (chunk-rematted) conv batch — see train_stage1.encode_batch.
        feat, emb = encode_batch(model, params, batch["images"],
                                 tcfg.remat_chunk if tcfg.remat else 0)

        def per_sample(feat_s, emb_s, labels, obj_valid, frame_valid, key):
            up = forward_sample_stage2(
                model, params, None, labels, obj_valid, cfg, key,
                frame_valid=frame_valid, feat_emb=(feat_s, emb_s))
            r, f = up.shape[:2]
            losses = jax.vmap(jax.vmap(
                lambda lo, la: bootstrapped_cross_entropy(lo, la, ratio)))(
                    up, jnp.broadcast_to(labels[None], (r, *labels.shape)))
            # later rounds carry more weight (the MA gate must help, not
            # hurt); padded frames contribute zero loss
            weights = (1.0 + jnp.arange(r, dtype=jnp.float32)[:, None]) \
                * frame_valid[None, :]
            return jnp.sum(losses * weights) / jnp.maximum(
                jnp.sum(weights), 1e-6)

        b = batch["images"].shape[0]
        loss = jnp.mean(jax.lax.map(
            lambda xs: per_sample(*xs),
            (feat, emb, batch["labels"], batch["obj_valid"],
             batch["frame_valid"], jax.random.split(key, b))))
        return loss, {"loss": loss}

    def train_step(state: TrainState, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, state.step, key)
        return state.apply_gradients(grads), metrics

    return train_step


class Stage2Trainer:
    """Mesh-sharded stage-2 trainer. Initialize from stage-1 params via
    `trainer.state = trainer.state.replace(params=stage1_params)`."""

    def __init__(self, cfg: Config, mesh=None, seed: int | None = None,
                 matching_backend: str = "auto"):
        self.cfg = cfg
        if mesh is None:
            n = len(jax.devices())
            data = next(d for d in range(min(n, cfg.train.batch_size), 0, -1)
                        if cfg.train.batch_size % d == 0)
            mesh = create_mesh(data=data, context=1)
        self.mesh = mesh
        # "auto": jnp oracle on CPU, the custom-VJP Pallas kernels on TPU
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
        self._key = jax.random.PRNGKey(cfg.train.seed + 1)

        repl = replicated_sharding(self.mesh)
        data_sh = batch_sharding(self.mesh)
        self.state = jax.device_put(self.state, repl)
        # exposed for prefetch_to_device in the train loops / benches
        self.batch_shardings = {"images": data_sh, "labels": data_sh,
                                "obj_valid": data_sh, "frame_valid": data_sh}
        self._step = jax.jit(
            make_train_step(self.model, cfg),
            in_shardings=(repl, self.batch_shardings, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,))

    def train_step(self, batch: Dict[str, np.ndarray], sync: bool = True):
        """One optimizer step; sync=False keeps metrics on device (see
        train_stage1.Trainer.train_step)."""
        self._key, sub = jax.random.split(self._key)
        self.state, metrics = self._step(self.state, batch, sub)
        return jax.device_get(metrics) if sync else metrics


def main(argv=None):
    from cvpr2020_manet_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import argparse
    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.utils.logging import MetricLogger
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    from cvpr2020_manet_tpu.engine.train_stage1 import (
        add_train_override_args, apply_train_overrides,
        export_release_if_requested)
    add_train_override_args(p)
    p.add_argument("--sim_rounds", type=int, default=None,
                   help="simulated interaction rounds per sample "
                        "(TrainConfig.stage2_rounds)")
    p.add_argument("--gmap_memory", action="store_true",
                   help="thread the C8 min-fusion memory through the "
                        "simulated rounds (measured HARMFUL: QUALITY.md "
                        "round-4 study, AUC 0.413 -> 0.250; kept for "
                        "ablation reproduction)")
    p.add_argument("--no_gmap_memory", action="store_true",
                   help="explicit off switch (the default; kept so "
                        "round-4 study command lines keep working)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--davis_root", default=None,
                   help="train on DAVIS clips (data/davis.py) instead of "
                        "synthetic")
    p.add_argument("--ytvos_root", default=None,
                   help="train on YouTube-VOS clips (data/ytvos.py)")
    p.add_argument("--clip_len", type=int, default=3,
                   help="frames per stage-2 clip (rounds propagate over "
                        "the clip; short sequences pad + frame_valid)")
    p.add_argument("--grain", action="store_true",
                   help="multiprocess grain input pipeline "
                        "(requires --davis_root)")
    p.add_argument("--grain_workers", type=int, default=4)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--shard_count", type=int, default=1)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD (parallel/distributed.py): "
                        "batch_size is the GLOBAL batch; coordinator/ranks "
                        "from the flags below, MANET_* env vars, or TPU-pod "
                        "auto-detection")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--uint8", action="store_true",
                   help="ship raw uint8 batches; normalize on device "
                        "(train_stage1.ingest_batch)")
    p.add_argument("--init_from", default=None,
                   help="stage-1 snapshot dir to initialize params from")
    p.add_argument("--snapshot_dir", default=None)
    p.add_argument("--log_dir", default=None)
    args = p.parse_args(argv)

    from cvpr2020_manet_tpu.parallel import distributed as dist
    proc, nproc = 0, 1
    if args.distributed:
        proc, nproc = dist.initialize(args.coordinator, args.num_processes,
                                      args.process_id)

    cfg = apply_train_overrides(
        tiny_test_config() if args.tiny else Config(), args)
    if args.sim_rounds is not None or args.gmap_memory:
        import dataclasses
        tr = {}
        if args.sim_rounds is not None:
            tr["stage2_rounds"] = args.sim_rounds
        if args.gmap_memory:
            tr["stage2_gmap_memory"] = True
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, **tr))
    local_bs = dist.local_batch_size(cfg.train.batch_size)
    trainer = Stage2Trainer(cfg)
    logger = MetricLogger(args.log_dir if proc == 0 else None,
                          quiet=proc != 0)

    shard_index, shard_count = args.shard_index, args.shard_count
    if args.distributed and shard_count == 1:
        shard_index, shard_count = proc, nproc
    if args.grain:
        assert args.davis_root, "--grain requires --davis_root"
        from cvpr2020_manet_tpu.data.grain_pipeline import make_train_iterator
        it = make_train_iterator(
            args.davis_root, cfg, clip_len=args.clip_len,
            num_workers=args.grain_workers, seed=cfg.train.seed,
            shard_index=shard_index, shard_count=shard_count,
            emit_uint8=args.uint8, batch_size=local_bs)
        next_batch = lambda: next(it)
    elif args.davis_root or args.ytvos_root:
        from cvpr2020_manet_tpu.data.davis import DavisTrainDataset
        adapter = None
        if args.ytvos_root:
            from cvpr2020_manet_tpu.data.ytvos import YTVOSDataset
            adapter = YTVOSDataset(args.ytvos_root)
        ds = DavisTrainDataset(
            args.davis_root or "", cfg, clip_len=args.clip_len,
            adapter=adapter, seed=cfg.train.seed + shard_index,
            emit_uint8=args.uint8,
            shard=((shard_index, shard_count) if shard_count > 1 else None))
        next_batch = lambda: ds.batch(local_bs)
    else:
        rng_syn = np.random.default_rng(cfg.train.seed + shard_index)
        next_batch = lambda: synthetic_batch(
            cfg, rng_syn, num_objects=args.objects,
            random_entry=args.random_entry, as_uint8=args.uint8,
            batch_size=local_bs)
    if args.distributed:
        base_feed = next_batch
        next_batch = lambda: dist.shard_host_batch(
            base_feed(), trainer.batch_shardings)

    if args.init_from:
        # stage 2 starts from the stage-1 snapshot (SURVEY.md §4.4: same
        # skeleton, now training the interaction branch + MA gate on top)
        from cvpr2020_manet_tpu.utils.checkpoint import CheckpointManager
        src = CheckpointManager(args.init_from)
        restored = src.restore(trainer.state)
        trainer.state = trainer.state.replace(params=restored.params)
        if proc == 0:
            print(f"initialized from stage-1 step {int(restored.step)}")

    mgr = None
    if args.snapshot_dir:
        from cvpr2020_manet_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.snapshot_dir)
        if mgr.latest_step() is not None:
            trainer.state = mgr.restore(trainer.state)
            if proc == 0:
                print(f"resumed from step {int(trainer.state.step)}")

    start = int(trainer.state.step)
    # synchronous numpy feed on purpose (see train_stage1.main and
    # engine/prefetch.py: async feeds are pathological on the tunneled
    # backend; opt-in for real pods)
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
