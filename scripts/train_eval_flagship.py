"""Flagship-scale synthetic train -> interactive eval on the live TPU.

Trains the FULL model (ResNet-101 encoder, production dims) with stage 1
on synthetic clips, exports a release checkpoint, and runs the 8-round
interactive protocol at 480p — the end-to-end production-scale proof
that training, checkpointing, and the segmented evaluator compose.

Measured 2026-08-16 (v5e-1, 400 steps, batch 2, crop 256, ~0.27 s/step):
  per-round J&F [0.269, 0.411, 0.579, 0.690, 0.756, 0.783, 0.807, 0.826]
  — monotone improvement across ALL 8 rounds (the MANet memory-
  aggregation claim, SURVEY.md §1) at p50 225 ms/round (71 fps).

    python scripts/train_eval_flagship.py --steps 400 --release /tmp/rel
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--sequences", type=int, default=2)
    p.add_argument("--release", default=None,
                   help="export dir for the trained release checkpoint")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, EvalConfig
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.engine.train_stage1 import (
        Trainer, synthetic_batch)
    from cvpr2020_manet_tpu.interactive.session import InteractiveSession
    from cvpr2020_manet_tpu.models import MANet

    cfg = Config(eval=EvalConfig(max_frames=args.frames))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, crop_size=(args.crop, args.crop),
            batch_size=args.batch, total_steps=args.steps))

    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        m = trainer.train_step(synthetic_batch(cfg, rng))
        if step % 100 == 0:
            print(f"step {step}: loss={float(m['loss']):.4f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s "
          f"(final loss {float(m['loss']):.4f})", flush=True)

    params = jax.device_get(trainer.state.params)
    if args.release:
        from cvpr2020_manet_tpu.utils.checkpoint import export_release
        export_release(params, args.release)
        print(f"release exported to {args.release}", flush=True)

    variables = {"params": params}
    ds = SyntheticDataset(image_size=cfg.eval.image_size,
                          num_frames=args.frames,
                          num_sequences=args.sequences, num_objects=2,
                          scribble_sets=1, seed=77)
    ev = Evaluator(cfg, trainer.model, variables)
    sess = InteractiveSession(ds, max_interactions=args.rounds)
    summary = ev.run_session(sess)
    rep = sess.get_report().assign(jf=lambda d: 0.5 * (d.jaccard + d.contour))
    per_round = rep.groupby("interaction").jf.mean()
    lat = np.asarray(ev.round_latencies)
    print(json.dumps({
        "per_round_jf": [round(float(x), 3) for x in per_round.tolist()],
        "auc": round(summary["auc"], 3),
        "p50_round_ms": round(1000 * float(np.median(lat)), 0),
    }))
    last, first = float(per_round.iloc[-1]), float(per_round.iloc[0])
    if last <= first:
        print("WARNING: rounds did not improve J&F")
        return 1
    print(f"OK: rounds improve J&F {first:.3f} -> {last:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
