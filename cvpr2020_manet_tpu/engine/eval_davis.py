"""Interactive DAVIS evaluation entry point (SURVEY.md L5 eval driver).

The reference's eval script wraps `DavisInteractiveSession` around IntVOS
(SURVEY.md §4.1). Here: DAVIS adapter -> InteractiveSession -> Evaluator,
ending in the time-vs-quality report (AUC, J&F@60s) and optional
mask/report dumps.

    python -m cvpr2020_manet_tpu.engine.eval_davis \
        --davis_root /data/DAVIS --rounds 8 --report out/report.csv
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_evaluator(cfg, checkpoint: str | None = None,
                    context_parallel: int = 1,
                    matching_backend: str = "auto"):
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.models import MANet
    from cvpr2020_manet_tpu.utils.checkpoint import load_release

    model = MANet(cfg.model, matching_backend=matching_backend)
    h, w = cfg.eval.image_size
    hp = h + (-h) % cfg.eval.pad_to
    wp = w + (-w) % cfg.eval.pad_to
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hp // 4, wp // 4, o)),
        jnp.zeros((1, hp // 4, wp // 4, o)))
    if checkpoint:
        params = load_release(variables["params"], checkpoint)
        variables = {**variables, "params": params}
    cp_mesh = None
    if context_parallel > 1:
        # matching-memory rows shard over 'context'; per-shard matching
        # combines with an all-gather-min (parallel/cp_matching.py)
        from cvpr2020_manet_tpu.parallel.mesh import create_mesh
        cp_mesh = create_mesh(data=1, context=context_parallel)
    return Evaluator(cfg, model, variables, cp_mesh=cp_mesh)


def main(argv=None):
    from cvpr2020_manet_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import dataclasses

    from cvpr2020_manet_tpu.config import Config
    from cvpr2020_manet_tpu.data.davis import DavisEvalDataset
    from cvpr2020_manet_tpu.interactive.session import InteractiveSession

    p = argparse.ArgumentParser()
    p.add_argument("--davis_root", required=True)
    p.add_argument("--subset", default="val")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--scribble_sets", type=int, default=3)
    p.add_argument("--max_time", type=float, default=None,
                   help="per-item time budget in s, scaled by object count "
                        "(davisinteractive max_time semantics)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax release export dir (utils/checkpoint.py)")
    p.add_argument("--report", default=None, help="CSV path for the report")
    p.add_argument("--matching_int8", action="store_true",
                   help="int8-quantized global matching (serving mode; "
                        "measured 1.28x matching-kernel speedup — "
                        "docs/BENCHMARKS.md round-5 int8 section, quality "
                        "cost in docs/QUALITY.md)")
    p.add_argument("--resume", action="store_true",
                   help="resume an interrupted run from --report: the "
                        "report is checkpointed after EVERY completed "
                        "(sequence, scribble-set) item, and on restart "
                        "items already in the CSV are skipped (their rows "
                        "seed the final summary). Local sessions only.")
    p.add_argument("--save_masks", default=None,
                   help="dir for final-round masks as DAVIS indexed PNGs")
    # default None -> inherit from the base config (so --tiny stays
    # self-consistent: its eval shapes come from tiny_test_config)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=None)
    p.add_argument("--matching_memory", default=None,
                   choices=["min_fused", "stacked"],
                   help="round-memory mode (config.EvalConfig)")
    p.add_argument("--mask_stride", type=int, default=None,
                   help="mask readback stride (config.EvalConfig): 2 "
                        "quarters the dominant mask download — measured "
                        "noise-level J&F cost at 480p (docs/QUALITY.md), "
                        "round 34%% faster on a slow link")
    p.add_argument("--gmap_refresh", type=float, default=None,
                   help="leaky min-fusion fraction (config.EvalConfig); "
                        "0 = reference-exact hard min (default), ~0.7 "
                        "measured +0.011 AUC on churn-heavy tasks "
                        "(docs/QUALITY.md round-4 study)")
    p.add_argument("--context_parallel", type=int, default=1,
                   help="shard the matching memory over this many devices "
                        "('context' mesh axis, all-gather-min combine); "
                        "pairs with --matching_memory stacked")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (smoke tests)")
    p.add_argument("--host", default=None,
                   help="http(s) URL of an interactive.service evaluation "
                        "server: scoring/robot run remotely, local DAVIS "
                        "supplies the frames (upstream remote mode)")
    args = p.parse_args(argv)

    if args.tiny:
        from cvpr2020_manet_tpu.config import tiny_test_config
        base = tiny_test_config()
    else:
        base = Config()
    overrides = dict(max_interactions=args.rounds,
                     scribble_sets=args.scribble_sets,
                     max_time=args.max_time)
    if args.max_frames is not None:
        overrides["max_frames"] = args.max_frames
    if args.image_size is not None:
        overrides["image_size"] = tuple(args.image_size)
    if args.matching_memory is not None:
        overrides["matching_memory"] = args.matching_memory
    if args.mask_stride is not None:
        overrides["mask_stride"] = args.mask_stride
    if args.gmap_refresh is not None:
        overrides["gmap_refresh"] = args.gmap_refresh
    cfg = dataclasses.replace(
        base, eval=dataclasses.replace(base.eval, **overrides),
        davis_root=args.davis_root)
    ds = DavisEvalDataset(args.davis_root, subset=args.subset,
                          scribble_sets=args.scribble_sets)
    if args.matching_int8 and args.context_parallel > 1:
        raise SystemExit("--matching_int8 is single-chip serving mode; "
                         "the context-parallel path shards f32 matching "
                         "(parallel/cp_matching.py) — drop one flag")
    evaluator = build_evaluator(
        cfg, args.checkpoint, context_parallel=args.context_parallel,
        matching_backend="pallas_int8" if args.matching_int8 else "auto")
    if args.host:
        if args.resume:
            raise SystemExit("--resume needs a local session (the remote "
                             "service owns the report) — drop --host")
        from cvpr2020_manet_tpu.interactive.service import RemoteSession
        session = RemoteSession(args.host, max_nb_interactions=args.rounds,
                                max_time=args.max_time, images=ds)
    else:
        skip_items, seed_rows = set(), None
        if args.resume:
            if not args.report:
                raise SystemExit("--resume needs --report (the CSV is the "
                                 "resume state)")
            if os.path.exists(args.report):
                import pandas as pd
                prev = pd.read_csv(args.report)
                # an item's rows are only written when the item FINISHES
                # (see on_item_end below), so presence in the CSV means
                # complete — no ambiguity with early-stopped items
                skip_items = set(
                    (str(s), int(i)) for s, i in
                    prev[["sequence", "scribble_idx"]]
                    .drop_duplicates().itertuples(index=False))
                seed_rows = prev.to_dict("records")
                print(f"resume: {len(skip_items)} completed items found in "
                      f"{args.report}", file=__import__('sys').stderr,
                      flush=True)
        on_item_end = None
        if args.resume:
            def on_item_end(seq, set_idx):
                # checkpoint the report after every completed item:
                # temp + rename so a kill mid-write can't corrupt the
                # resume state
                os.makedirs(os.path.dirname(args.report) or ".",
                            exist_ok=True)
                tmp = args.report + ".tmp"
                session.get_report().to_csv(tmp, index=False)
                os.replace(tmp, args.report)
        session = InteractiveSession(ds, max_interactions=args.rounds,
                                     max_time=args.max_time,
                                     skip_items=skip_items,
                                     seed_rows=seed_rows,
                                     on_item_end=on_item_end)

    import sys
    import time as _time
    t_start = _time.perf_counter()
    n_items = len(ds.sequences()) * args.scribble_sets

    save_fn = None
    if args.save_masks:
        from cvpr2020_manet_tpu.utils.colormap import save_indexed_png

        def save_fn(seq, set_idx, round_idx, masks):
            # final round overwrites earlier ones -> dir holds last-round
            # masks in DAVIS layout
            d = os.path.join(args.save_masks, f"scribble{set_idx + 1}", seq)
            os.makedirs(d, exist_ok=True)
            for t in range(masks.shape[0]):
                save_indexed_png(os.path.join(d, f"{t:05d}.png"), masks[t])

    def on_masks(seq, set_idx, round_idx, masks):
        # per-round progress to stderr: a DAVIS-val session is hundreds of
        # rounds over tens of minutes — silence until the final JSON made
        # long runs undiagnosable (upstream davisinteractive logs each
        # interaction the same way)
        dt = evaluator.round_latencies[-1] if evaluator.round_latencies \
            else float("nan")
        print(f"[{_time.perf_counter() - t_start:7.1f}s] {seq} set {set_idx} "
              f"round {round_idx}: {masks.shape[0]} frames in {dt:.2f}s "
              f"({n_items} items total)", file=sys.stderr, flush=True)
        if save_fn is not None:
            save_fn(seq, set_idx, round_idx, masks)

    summary = evaluator.run_session(session, on_masks=on_masks)

    if args.report:
        os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
        session.get_report().to_csv(args.report, index=False)
    lat = np.asarray(evaluator.round_latencies)
    # per-frame-bucket p50: DAVIS val spans the 32/64/104 buckets and the
    # long-sequence rounds cost proportionally more (more frames per
    # round) — a global p50 alone hides that
    per_bucket = {}
    for tb, _, dt in evaluator.round_records:
        per_bucket.setdefault(tb, []).append(dt)
    print(json.dumps({
        "auc": round(summary["auc"], 4),
        "jf_at_60s": round(summary["metric_at_threshold"], 4),
        "p50_round_latency_s": round(float(np.median(lat)), 4) if lat.size else None,
        "rounds_run": int(lat.size),
        "p50_by_frame_bucket": {
            str(tb): round(float(np.median(v)), 4)
            for tb, v in sorted(per_bucket.items())},
    }))
    if args.host:
        session.close()  # free the server-side session (report is in hand)


if __name__ == "__main__":
    main()
