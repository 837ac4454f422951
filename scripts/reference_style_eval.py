"""Reference-style eval: the upstream `davisinteractive` loop, verbatim.

This is the migration proof for the reference's eval entry point
(SURVEY.md §4.1): the protocol loop below is written ONLY against
`davisinteractive.*` imports — exactly how lightas/CVPR2020_MANet's eval
script drives the toolkit — with this framework's MANet supplying the
masks. Moving from the reference means swapping the model construction;
the loop itself does not change. (The framework-native CLI,
`engine/eval_davis.py`, is the production path; this script exists to
demonstrate the drop-in shim.)

    python scripts/reference_style_eval.py --synthetic --rounds 2
    python scripts/reference_style_eval.py --davis_root /data/DAVIS \
        --checkpoint ckpts/release --report out/report.csv
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--davis_root", default=None)
    p.add_argument("--subset", default="val")
    p.add_argument("--synthetic", action="store_true",
                   help="tiny synthetic dataset + tiny model (smoke)")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--report", default=None)
    args = p.parse_args(argv)

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.engine.eval_davis import build_evaluator

    # ---- model side (the only part migration changes) ----------------
    dataset = None
    if args.synthetic:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        from cvpr2020_manet_tpu.data import SyntheticDataset
        cfg = tiny_test_config()
        dataset = SyntheticDataset(image_size=cfg.eval.image_size,
                                   num_frames=cfg.eval.max_frames,
                                   num_sequences=1, num_objects=2,
                                   scribble_sets=1)
    else:
        cfg = Config()
    evaluator = build_evaluator(cfg, checkpoint=args.checkpoint)
    states = {}   # one model state per (sequence, scribble-set) item

    # ---- protocol loop: upstream davisinteractive API, unmodified ----
    from davisinteractive.session import DavisInteractiveSession

    with DavisInteractiveSession(davis_root=args.davis_root,
                                 subset=args.subset,
                                 dataset=dataset,
                                 max_nb_interactions=args.rounds) as sess:
        while sess.next():
            sequence, scribbles, _first = sess.get_scribbles(only_last=True)
            ds = sess.dataset
            key = sess.current
            if key not in states:
                images = ds.images(sequence)
                states[key] = (evaluator.start_sequence(
                    images, ds.num_objects(sequence)), images.shape[1:3])
            state, hw = states[key]
            masks = evaluator.run_round(state, scribbles, hw,
                                        ds.num_objects(sequence))
            sess.submit_masks(masks)

    report = sess.get_report()
    summary = sess.get_global_summary()
    if args.report:
        os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
        report.to_csv(args.report, index=False)
    print(json.dumps({
        "auc": round(float(summary["auc"]), 4),
        "jf_at_60s": round(float(summary["metric_at_threshold"]), 4),
        "rows": len(report),
    }))


if __name__ == "__main__":
    main()
