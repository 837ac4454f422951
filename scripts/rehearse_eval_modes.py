"""DAVIS-val-scale dress rehearsal of the NON-DEFAULT eval modes (r4 #3).

The round-4 rehearsal (docs/TRAINING.md §4) ran only the default config
(min_fused, f32 matching, mask_stride 1). This orchestrator re-runs the
fake-DAVIS val-scale session through the REAL `eval_davis` CLI in four
legs, all on the chip:

  1. default     — uninterrupted baseline (re-times the §4 table and is
                   the equality reference for leg 2)
  2. resume      — same config, `kill -9`'d mid-session after >=1 item
                   checkpoint, restarted with --resume; the final report's
                   metric rows must EQUAL leg 1's (timing differs)
  3. stacked     — --matching_memory stacked (live-page bucketing x the
                   104-frame bucket x 8 rounds: HBM stress never run
                   on-chip at this scale)
  4. int8        — --matching_int8 (pairs with the round-5 kernel
                   measurement; round-level p50s at val scale)

    python scripts/rehearse_eval_modes.py --root /tmp/fake_davis \
        [--legs default,resume,stacked,int8] [--rounds 8] [--out DIR]

Prints one JSON line per leg (per-bucket p50s + wall-clock) and a final
summary line; non-zero exit if the resume equality check fails.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRIC_COLS = ["sequence", "scribble_idx", "interaction", "object_id",
               "frame", "jaccard", "contour"]


def _cli(root, report, rounds, extra=(), checkpoint=None):
    cmd = [sys.executable, "-m", "cvpr2020_manet_tpu.engine.eval_davis",
           "--davis_root", root, "--rounds", str(rounds),
           "--report", report] + list(extra)
    if checkpoint:
        cmd += ["--checkpoint", checkpoint]
    return cmd


def _items_in_csv(report):
    if not os.path.exists(report):
        return 0
    import pandas as pd
    try:
        df = pd.read_csv(report)
    except Exception:
        return 0
    if len(df) == 0:
        return 0
    return len(df[["sequence", "scribble_idx"]].drop_duplicates())


def _metric_rows(report):
    import pandas as pd
    df = pd.read_csv(report)[METRIC_COLS]
    return (df.sort_values(METRIC_COLS).reset_index(drop=True).round(10))


def _run_leg(name, cmd, log_path):
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              stderr=log, text=True)
    wall = time.time() - t0
    if proc.returncode != 0:
        print(f"[{name}] FAILED rc={proc.returncode}; stderr tail:",
              file=sys.stderr)
        with open(log_path) as f:
            print("".join(f.readlines()[-20:]), file=sys.stderr)
        return None, wall
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line), wall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="fake-DAVIS tree "
                   "(scripts/make_fake_davis.py --root <here> if missing)")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--legs", default="default,resume,stacked,int8")
    p.add_argument("--checkpoint", default=None,
                   help="release dir (random init otherwise — latency/"
                        "HBM/resume behavior do not depend on weights)")
    p.add_argument("--out", default="/tmp/rehearsal_r5")
    p.add_argument("--kill_after_items", type=int, default=3,
                   help="resume leg: SIGKILL once this many items are "
                        "checkpointed (15 items total at val scale)")
    p.add_argument("--cli_extra", default="",
                   help="extra args appended to every eval_davis leg "
                        "(smoke tests: '--tiny --max_frames 4 ...')")
    args = p.parse_args(argv)
    extra_common = args.cli_extra.split()

    os.makedirs(args.out, exist_ok=True)
    if not os.path.isdir(os.path.join(args.root, "JPEGImages")):
        print(f"generating fake-DAVIS tree at {args.root}", flush=True)
        subprocess.run([sys.executable, "scripts/make_fake_davis.py",
                        "--root", args.root], check=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))

    legs = [s.strip() for s in args.legs.split(",") if s.strip()]
    results, failed = {}, []

    leg_extra = {
        "default": [],
        "stacked": ["--matching_memory", "stacked"],
        "int8": ["--matching_int8"],
    }

    for leg in legs:
        report = os.path.join(args.out, f"report_{leg}.csv")
        log = os.path.join(args.out, f"{leg}.stderr")
        if leg in leg_extra:
            if os.path.exists(report):
                os.remove(report)
            cmd = _cli(args.root, report, args.rounds,
                       leg_extra[leg] + extra_common, args.checkpoint)
            print(f"[{leg}] {' '.join(cmd)}", flush=True)
            rec, wall = _run_leg(leg, cmd, log)
            if rec is None:
                failed.append(leg)
                continue
            rec.update(leg=leg, wall_s=round(wall, 1))
            results[leg] = rec
            print(json.dumps(rec), flush=True)

        elif leg == "resume":
            if "default" not in results:
                print("[resume] needs the default leg first", file=sys.stderr)
                failed.append(leg)
                continue
            report_r = os.path.join(args.out, "report_resume.csv")
            if os.path.exists(report_r):
                os.remove(report_r)
            cmd = _cli(args.root, report_r, args.rounds,
                       ["--resume"] + extra_common, args.checkpoint)
            print(f"[resume] launch + kill -9 after "
                  f"{args.kill_after_items} items", flush=True)
            with open(os.path.join(args.out, "resume_killed.stderr"),
                      "w") as lf:
                child = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                                         stderr=lf)
            killed_at = None
            deadline = time.time() + 3600
            while time.time() < deadline:
                n = _items_in_csv(report_r)
                if n >= args.kill_after_items:
                    if child.poll() is None:
                        child.send_signal(signal.SIGKILL)
                        child.wait(60)
                        killed_at = n
                    break
                if child.poll() is not None:
                    break
                time.sleep(1.0)
            if killed_at is None:
                print("[resume] kill window missed (run finished first?) "
                      "— still exercising the restart path", flush=True)
            t0 = time.time()
            rec, wall = _run_leg("resume", cmd, log)
            if rec is None:
                failed.append(leg)
                continue
            rows_a = _metric_rows(
                os.path.join(args.out, "report_default.csv"))
            rows_b = _metric_rows(report_r)
            equal = rows_a.equals(rows_b)
            rec.update(leg=leg, wall_s=round(wall, 1),
                       killed_after_items=killed_at,
                       report_equals_uninterrupted=bool(equal))
            results[leg] = rec
            print(json.dumps(rec), flush=True)
            if not equal:
                print("[resume] REPORT MISMATCH vs uninterrupted run",
                      file=sys.stderr)
                failed.append(leg)
        else:
            print(f"unknown leg {leg!r}", file=sys.stderr)
            failed.append(leg)

    print(json.dumps({"summary": {k: {
        "auc": v.get("auc"), "wall_s": v.get("wall_s"),
        "p50_by_frame_bucket": v.get("p50_by_frame_bucket")}
        for k, v in results.items()}, "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
