"""End-to-end quality smoke: train tiny stage-1 on synthetic clips, then
run the interactive protocol and compare AUC/J&F against the untrained
model. CPU-runnable (BASELINE config 1 flavor).

    python scripts/train_eval_synthetic.py --steps 300
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(cfg, model, variables, rounds=3):
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.interactive.session import InteractiveSession

    ds = SyntheticDataset(image_size=cfg.eval.image_size,
                          num_frames=cfg.eval.max_frames,
                          num_sequences=2, num_objects=2, scribble_sets=1,
                          seed=123)
    ev = Evaluator(cfg, model, variables)
    sess = InteractiveSession(ds, max_interactions=rounds)
    summary = ev.run_session(sess)
    rep = sess.get_report()
    jf_last = rep[rep.interaction == rep.interaction.max()][
        ["jaccard", "contour"]].mean().mean()
    return summary["auc"], float(jf_last)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.engine.train_stage1 import (
        Trainer, synthetic_batch)

    cfg = tiny_test_config()
    # size the poly-LR schedule to this run (tiny config defaults to 10)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, total_steps=args.steps,
                                       base_lr=2e-2))
    trainer = Trainer(cfg)
    v0 = {"params": jax.device_get(trainer.state.params)}

    auc0, jf0 = evaluate(cfg, trainer.model, v0)
    print(f"untrained: AUC={auc0:.3f} J&F@last={jf0:.3f}", flush=True)

    rng = np.random.default_rng(0)
    for step in range(args.steps):
        m = trainer.train_step(synthetic_batch(cfg, rng))
        if step % 50 == 0:
            print(f"step {step}: loss={float(m['loss']):.4f}", flush=True)

    v1 = {"params": jax.device_get(trainer.state.params)}
    auc1, jf1 = evaluate(cfg, trainer.model, v1)
    print(f"trained  : AUC={auc1:.3f} J&F@last={jf1:.3f}", flush=True)
    if jf1 <= jf0:
        print("WARNING: training did not improve interactive J&F")
        return 1
    print("OK: training improves interactive quality")
    return 0


if __name__ == "__main__":
    sys.exit(main())
