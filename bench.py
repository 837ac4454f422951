"""Benchmark: 480p interactive-round propagation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

What is measured: full flagship-model interaction rounds at DAVIS 480p
(ResNet-101 features cached once; per round: interaction branch + TWO
bidirectional propagation sweeps — Pallas global matching, local matching,
decoder — + mask upsample/argmax + host transfer of the label maps).
`value` = useful propagated frames per second per chip, i.e. T_frames /
wall-clock round time, conservatively charging the 2x bidirectional sweep
and all per-round overheads against throughput.

The wall-clock number rides a SHARED tunnel whose measured bandwidth
varies ~4x by time of day (docs/BENCHMARKS.md "tunnel characterization";
BENCH_r03 captured 47.8 fps on a ~17 MB/s morning vs 88.7 fps back-to-back
the same build on a healthy link). So the line also carries
link-independent companions that let a reader separate "slow code" from
"slow link":
  device_path_fps      — frames / pure device round time, measured by
                         chaining dispatch-only rounds (no mask download,
                         raster pre-uploaded) and DIFFERENCING two chain
                         lengths, which cancels every fixed host/RTT cost.
                         This is the code's figure of merit.
  device_busy_fraction — device round time / wall-clock round time.
  link_up_MBps / link_down_MBps / link_rtt_ms — the tunnel, probed in the
                         same run, so every record is self-interpreting.

vs_baseline: the reference's GPU propagation rate was not published with
confidence (BASELINE.md: "TO VERIFY"); we use REF_GPU_PROP_FPS = 20.0 — a
deliberately generous estimate for the reference's per-frame propagation
(chunked 26k x 26k x 100 matching + decoder) on a paper-era GPU — so the
ratio reported here understates the speedup rather than overstating it.

Timing note: on the tunneled TPU backend, block_until_ready does not
synchronize with device completion; every timed section ends with a
device->host transfer (np.asarray), which does.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REF_GPU_PROP_FPS = 20.0
FRAMES = 16          # frames per synthetic 480p sequence (driver default;
                     # --frames 64 measures the realistic DAVIS bucket —
                     # docs/BENCHMARKS.md records both)
WARMUP = 2           # untimed rounds (compile + steady-state dispatch)
ROUNDS = 8           # timed rounds; metric = median (tunnel RTT jitters)


READY_TIMEOUT_S = 180.0   # backend init budget (healthy tunnel: seconds)
TOTAL_TIMEOUT_S = 3300.0  # full-run budget (cold remote AOT compiles run
                          # minutes per graph — see docs/BENCHMARKS.md)


def _error_record(frames, msg):
    # Last measured steady state lives in docs/BENCHMARKS.md; value 0
    # here means "backend unreachable at run time", not "slow".
    return json.dumps({
        "metric": "propagation_fps_per_chip_480p",
        "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
        "frames": frames, "error": msg,
    })


def _watchdog(argv, frames):
    """Run the measurement in a KILLABLE child; forward its JSON line.

    During a tunnel outage `jax.devices()` hangs indefinitely inside
    backend init (observed 6h+, 2026-08-17/18) — no in-process timeout
    can interrupt it, so the measurement itself must be the subprocess
    (it then pays backend init exactly once). The child announces
    "READY" after backend init; no READY within READY_TIMEOUT_S = a hung
    tunnel -> kill and print an honest error record so the driver gets a
    parseable line either way.
    """
    import threading
    env = dict(os.environ, MANET_BENCH_CHILD="1")
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + list(argv),
        stdout=subprocess.PIPE, text=True, env=env)
    ready = threading.Event()
    lines = []

    def reader():
        for line in child.stdout:
            line = line.strip()
            if line == "READY":
                ready.set()
            elif line:
                lines.append(line)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    if not ready.wait(READY_TIMEOUT_S):
        child.kill()
        print(_error_record(
            frames, "tpu_backend_unreachable (tunnel outage; backend "
                    f"init exceeded {READY_TIMEOUT_S:.0f}s)"))
        return
    try:
        child.wait(TOTAL_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        child.kill()
        print(_error_record(
            frames, f"bench exceeded {TOTAL_TIMEOUT_S:.0f}s after "
                    "backend init (hung mid-run)"))
        return
    t.join(10.0)
    if child.returncode == 0 and lines:
        print(lines[-1])
    else:
        print(_error_record(
            frames, f"bench child exited rc={child.returncode}"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=FRAMES)
    p.add_argument("--rounds", type=int, default=ROUNDS)
    p.add_argument("--matching_int8", action="store_true",
                   help="int8-quantized global matching (serving mode; "
                        "docs/BENCHMARKS.md round-5 int8 section)")
    p.add_argument("--mask_stride", type=int, default=1,
                   help="mask readback stride (2 = quarter the dominant "
                        "download; measured noise-level J&F cost at 480p "
                        "— docs/QUALITY.md)")
    args, argv = p.parse_args(argv), list(sys.argv[1:] if argv is None
                                          else argv)
    frames, rounds = args.frames, args.rounds
    if os.environ.get("MANET_BENCH_CHILD") != "1":
        return _watchdog(argv, frames)
    import jax
    if os.environ.get("MANET_BENCH_PLATFORM"):
        # test hook: the sandbox's sitecustomize overrides JAX_PLATFORMS,
        # so a CPU run of the child needs the in-process config update
        jax.config.update("jax_platforms",
                          os.environ["MANET_BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.devices()            # backend init — the hang point in an outage
    print("READY", flush=True)
    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, EvalConfig
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
    from cvpr2020_manet_tpu.models import MANet

    cfg = Config(eval=EvalConfig(max_frames=frames,
                                 mask_stride=args.mask_stride))
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1

    ds = SyntheticDataset(image_size=(h, w), num_frames=frames,
                          num_sequences=1, num_objects=2, scribble_sets=1)
    seq = ds.sequences()[0]
    gt = ds.gt_masks(seq)

    model = MANet(cfg.model, matching_backend=(
        "pallas_int8" if args.matching_int8 else "auto"))
    hh = (h + (-h) % cfg.eval.pad_to) // 4
    ww = (w + (-w) % cfg.eval.pad_to) // 4
    # jit the init: eager init dispatches thousands of ops one-by-one,
    # which is pathological through the tunneled TPU backend
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h + (-h) % cfg.eval.pad_to,
                   w + (-w) % cfg.eval.pad_to, 3)),
        jnp.zeros((1, hh, ww, o)), jnp.zeros((1, hh, ww, o)))

    evaluator = Evaluator(cfg, model, variables)
    # num_objects selects the 4-wide object bucket (2 objects + bg fit);
    # the realistic case — most DAVIS sequences have <= 3 objects.
    state = evaluator.start_sequence(ds.images(seq), ds.num_objects(seq))

    robot = InteractiveScribblesRobot()
    masks = np.zeros_like(gt)
    # warm-up rounds: first compiles the round graph, second confirms the
    # steady-state dispatch path (donated buffers, cached executables)
    for _ in range(WARMUP):
        scr = robot.interact(seq, masks, gt, ds.num_objects(seq))
        masks = evaluator.run_round(state, scr.to_json(), gt.shape[1:],
                                    ds.num_objects(seq))
    evaluator.round_latencies.clear()

    for _ in range(rounds):
        scr = robot.interact(seq, masks, gt, ds.num_objects(seq))
        masks = evaluator.run_round(state, scr.to_json(), gt.shape[1:],
                                    ds.num_objects(seq))

    p50 = float(np.median(evaluator.round_latencies))
    fps = frames / p50

    # ---- device-path measurement (link-independent) -------------------
    # Chain dispatch-only rounds (same compiled graphs as above — the
    # segmented round's _start/_sweep executables) with ONE pre-uploaded
    # raster and no mask downloads; a 1-element probe of the final mask
    # buffer forces completion. Differencing two chain lengths cancels
    # the probe RTT and all per-chain fixed costs exactly.
    from cvpr2020_manet_tpu.interactive.scribbles import (
        annotated_frames, scribbles2mask)
    sj = scr.to_json()
    annot = annotated_frames(sj)[0]
    raster = scribbles2mask(
        {"sequence": sj["sequence"], "scribbles": [sj["scribbles"][annot]]},
        gt.shape[1:])[0]
    raster = np.pad(raster,
                    [(0, (-gt.shape[1]) % cfg.eval.pad_to),
                     (0, (-gt.shape[2]) % cfg.eval.pad_to)],
                    constant_values=-1).astype(np.int8)
    raster_dev = jax.device_put(raster)

    def chain(n):
        t0 = time.perf_counter()
        handle = None
        for _ in range(n):
            handle = evaluator.dispatch_round(state, raster_dev, annot,
                                              ds.num_objects(seq))
        handle.probe()
        return time.perf_counter() - t0

    n0 = max(2, rounds // 2)
    chain(1)                       # settle dispatch path
    t_short = min(chain(n0) for _ in range(2))
    t_long = min(chain(2 * n0) for _ in range(2))
    if t_long > t_short * 1.05:
        dev_round = (t_long - t_short) / n0
    else:                          # variance swallowed the difference:
        dev_round = t_long / (2 * n0)   # upper bound (includes probe RTT)
    device_path_fps = frames / dev_round

    # ---- tunnel probes (self-interpreting record) ----------------------
    # Every executable (fills, slices) is warmed BEFORE its timed use: a
    # first-use graph goes through the remote AOT compile service and a
    # compile landing inside a timed section dwarfs the transfer being
    # measured. Fresh buffers per timing (computed fills with new fill
    # values; new host arrays) so no host-side cache can serve a fetch.
    def _link_probes():
        fill_small = jax.jit(lambda x: jnp.full((1024,), x, jnp.uint8))
        fill_big = jax.jit(lambda x: jnp.full((4 << 20,), x, jnp.uint8))
        head = jax.jit(lambda x: x[:8])
        up_small = np.zeros(1024, np.uint8)
        up_big = np.arange(8 << 20, dtype=np.uint8)
        np.asarray(fill_small(jnp.uint8(0)))          # warm-up, untimed
        np.asarray(fill_big(jnp.uint8(0)))
        np.asarray(head(jax.device_put(up_small)))
        np.asarray(head(jax.device_put(up_big)))

        def timed(f):
            t0 = time.perf_counter()
            f()
            return time.perf_counter() - t0

        rtt = min(timed(lambda i=i: np.asarray(fill_small(jnp.uint8(i))))
                  for i in (1, 2, 3))
        t_down = min(timed(lambda i=i: np.asarray(fill_big(jnp.uint8(i))))
                     for i in (1, 2))
        down = 4.0 / max(1e-3, t_down - rtt)
        t_us = min(timed(
            lambda i=i: np.asarray(head(jax.device_put(up_small + i))))
            for i in (1, 2))
        t_ub = min(timed(
            lambda i=i: np.asarray(head(jax.device_put(up_big + i))))
            for i in (1, 2))
        up = 8.0 / max(1e-3, t_ub - t_us)
        return {"link_rtt_ms": round(1000 * rtt, 1),
                "link_down_MBps": round(down, 1),
                "link_up_MBps": round(up, 1)}

    try:
        link = _link_probes()
    except Exception as e:          # a failed probe must not kill the line
        link = {"link_probe_error": str(e)[:120]}

    print(json.dumps({
        "metric": "propagation_fps_per_chip_480p",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_GPU_PROP_FPS, 2),
        "frames": frames,
        "p50_round_ms": round(1000 * p50, 1),
        "device_path_fps": round(device_path_fps, 2),
        "device_path_vs_baseline": round(device_path_fps
                                         / REF_GPU_PROP_FPS, 2),
        "device_busy_fraction": round(dev_round / p50, 3),
        # configuration of record (docs/BENCHMARKS.md "Bench configuration
        # of record"): defaults measure the parity-exact config; every
        # JSON line states what it measured
        "matching_backend": "pallas_int8" if args.matching_int8
                            else "pallas_bf16",
        "mask_stride": args.mask_stride,
        **link,
    }))


if __name__ == "__main__":
    main()
