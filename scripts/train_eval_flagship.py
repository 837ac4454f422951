"""Flagship-scale synthetic train -> interactive eval on the live TPU.

The production-scale end-to-end proof (VERDICT r2 #2 shape):
  stage-1 train (full ResNet-101, production dims)
  -> stage-2 train (multi-round interaction sim, MA gate under training)
  -> 8-round interactive protocol at 480p on a NON-SATURATING task:
     objects ENTER MID-SEQUENCE (SyntheticDataset entry_frames), so an
     early annotated frame cannot segment them — multi-round correction
     and the cross-round matching/MA memory retaining it are structurally
     necessary, and the per-round curve cannot saturate at round 0.
  -> metrics come out of the PRODUCTION L5->L6 path: InteractiveSession
     -> submit_masks -> get_report()/get_global_summary() (AUC, J&F@60s).
  -> optional --ablate leg re-runs the protocol with the cross-round
     memories disabled (Evaluator ablate_memory) to quantify the MA
     contribution on the same task.

Measured results: docs/QUALITY.md ("Flagship-scale proof" table).

    python scripts/train_eval_flagship.py --steps1 600 --steps2 300 \
        --sequences 4 --objects 3 --ablate --release /tmp/rel
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _per_round_jf(sess):
    rep = sess.get_report().assign(jf=lambda d: 0.5 * (d.jaccard + d.contour))
    return rep.groupby("interaction").jf.mean()


def run_protocol(ev, ds, rounds):
    from cvpr2020_manet_tpu.interactive.session import InteractiveSession
    sess = InteractiveSession(ds, max_interactions=rounds)
    summary = ev.run_session(sess)
    per_round = _per_round_jf(sess)
    return summary, per_round


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps1", type=int, default=600,
                   help="stage-1 training steps")
    p.add_argument("--steps2", type=int, default=300,
                   help="stage-2 training steps (0 = skip the stage-2 leg)")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--crop2", type=int, default=192,
                   help="stage-2 crop (the multi-round simulation holds "
                        "R x F full activation sets; crop 256 x 3 rounds "
                        "OOMs a 16G v5e chip)")
    p.add_argument("--rounds2", type=int, default=2,
                   help="simulated rounds per stage-2 sample")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--sequences", type=int, default=4)
    p.add_argument("--objects", type=int, default=3)
    p.add_argument("--sets", type=int, default=3,
                   help="initial scribble sets per sequence (DAVIS uses 3)")
    p.add_argument("--ablate", action="store_true",
                   help="also run the memory-ablated protocol (MA delta)")
    p.add_argument("--release", default=None,
                   help="export dir for the trained release checkpoint")
    p.add_argument("--eval_release", default=None,
                   help="skip training; load params from this release dir "
                        "and run the eval protocol only")
    p.add_argument("--gmap_refresh", type=float, default=0.0,
                   help="leaky min-fusion fraction (config.EvalConfig)")
    p.add_argument("--mask_stride", type=int, default=1,
                   help="mask readback stride (config.EvalConfig): 2 "
                        "quarters the dominant mask download; this flag "
                        "measures its J&F cost at flagship 480p")
    p.add_argument("--matching_int8", action="store_true",
                   help="eval leg uses the int8-quantized global-matching "
                        "backend (serving mode) — measures its quality "
                        "cost vs the bf16 kernel on the same release")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + tiny eval resolution (CPU logic "
                        "smoke; NOT a flagship measurement)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    from cvpr2020_manet_tpu.config import (
        Config, EvalConfig, tiny_test_config)
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.engine.train_stage1 import (
        Trainer, synthetic_batch)

    if args.tiny:
        base = tiny_test_config()
        cfg = dataclasses.replace(
            base, eval=dataclasses.replace(base.eval,
                                           max_frames=args.frames))
        args.crop = base.train.crop_size[0]
    else:
        cfg = Config(eval=EvalConfig(max_frames=args.frames))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, crop_size=(args.crop, args.crop),
            batch_size=args.batch, total_steps=args.steps1))

    if args.gmap_refresh > 0.0 or args.mask_stride != 1:
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval,
                                          gmap_refresh=args.gmap_refresh,
                                          mask_stride=args.mask_stride))
    if args.eval_release:
        from cvpr2020_manet_tpu.models import MANet
        from cvpr2020_manet_tpu.utils.checkpoint import load_release
        model = MANet(cfg.model, matching_backend=(
            "pallas_int8" if args.matching_int8 else "auto"))
        h, w = cfg.eval.image_size
        hp = h + (-h) % cfg.eval.pad_to
        wp = w + (-w) % cfg.eval.pad_to
        o = cfg.model.max_objects + 1
        import jax.numpy as jnp
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
            jnp.zeros((1, hp // 4, wp // 4, o)),
            jnp.zeros((1, hp // 4, wp // 4, o)))
        params = load_release(variables["params"], args.eval_release)
        print(f"eval-only: params from {args.eval_release}", flush=True)
        return _eval_leg(args, cfg, model, {"params": params})

    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    t0 = time.time()
    m = {"loss": float("nan")}
    for step in range(args.steps1):
        m = trainer.train_step(synthetic_batch(
            cfg, rng, num_objects=args.objects, random_entry=True))
        if step % 100 == 0:
            print(f"stage1 step {step}: loss={float(m['loss']):.4f}",
                  flush=True)
    print(f"stage1: {args.steps1} steps in {time.time() - t0:.0f}s "
          f"(final loss {float(m['loss']):.4f})", flush=True)
    params = trainer.state.params

    if args.steps2 > 0:
        from cvpr2020_manet_tpu.engine.train_stage2 import Stage2Trainer
        cfg2 = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, total_steps=args.steps2,
                crop_size=(args.crop2, args.crop2),
                stage2_rounds=args.rounds2))
        t2 = Stage2Trainer(cfg2)
        t2.state = t2.state.replace(params=params)
        t0 = time.time()
        for step in range(args.steps2):
            m = t2.train_step(synthetic_batch(
                cfg2, rng, num_objects=args.objects, random_entry=True))
            if step % 100 == 0:
                print(f"stage2 step {step}: loss={float(m['loss']):.4f}",
                      flush=True)
        print(f"stage2: {args.steps2} steps in {time.time() - t0:.0f}s "
              f"(final loss {float(m['loss']):.4f})", flush=True)
        params = t2.state.params

    params = jax.device_get(params)
    if args.release:
        from cvpr2020_manet_tpu.utils.checkpoint import export_release
        export_release(params, args.release)
        print(f"release exported to {args.release}", flush=True)
    # evaluate with the PRODUCTION model (plain eval kernels, not the
    # trainer's custom-VJP argmin variants) — same params, same masks,
    # and the round latency matches what eval_davis/bench.py ship
    from cvpr2020_manet_tpu.models import MANet
    model = MANet(cfg.model, matching_backend=(
        "pallas_int8" if args.matching_int8 else "auto"))
    return _eval_leg(args, cfg, model, {"params": params})


def _eval_leg(args, cfg, model, variables):
    import dataclasses  # noqa: F401  (kept for parity with main)
    import jax  # noqa: F401
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator

    # Non-saturating eval task: objects enter at staggered mid-sequence
    # frames — rounds whose annotated frame precedes an object's entry
    # cannot see it; later rounds must, and the memories must retain it.
    entry = [int(i * args.frames / (args.objects + 1))
             for i in range(args.objects)]
    ds = SyntheticDataset(image_size=cfg.eval.image_size,
                          num_frames=args.frames,
                          num_sequences=args.sequences,
                          num_objects=args.objects,
                          scribble_sets=args.sets, seed=77,
                          entry_frames=entry)
    print(f"eval task: {args.sequences} seq x {args.sets} sets, "
          f"{args.objects} objects entering at frames {entry}, "
          f"gmap_refresh={cfg.eval.gmap_refresh}", flush=True)

    ev = Evaluator(cfg, model, variables)
    summary, per_round = run_protocol(ev, ds, args.rounds)
    lat = np.asarray(ev.round_latencies)
    out = {
        "per_round_jf": [round(float(x), 3) for x in per_round.tolist()],
        "auc": round(summary["auc"], 3),
        "jf_at_60s": round(float(summary["metric_at_threshold"]), 3),
        "p50_round_ms": round(1000 * float(np.median(lat)), 0),
        "entry_frames": entry,
    }

    if args.ablate:
        ev_ab = Evaluator(cfg, model, variables, ablate_memory=True)
        summary_ab, per_round_ab = run_protocol(ev_ab, ds, args.rounds)
        out["ablate_per_round_jf"] = [round(float(x), 3)
                                      for x in per_round_ab.tolist()]
        out["ablate_auc"] = round(summary_ab["auc"], 3)
        out["memory_auc_delta"] = round(out["auc"] - out["ablate_auc"], 3)

    print(json.dumps(out))
    last, first = float(per_round.iloc[-1]), float(per_round.iloc[0])
    if last <= first:
        print("WARNING: rounds did not improve J&F")
        return 1
    print(f"OK: rounds improve J&F {first:.3f} -> {last:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
