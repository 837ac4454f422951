"""Microbenchmark: global-matching Pallas kernel at production shapes.

Times `global_matching_prepared` (the eval hot loop's kernel — SURVEY.md
C3) in isolation: Nq query pixels vs Nk bucketed reference pixels at
C=128 lanes, bf16, default (TQ, TK) tiles. Reports ms/frame and
effective TFLOP/s (2*Nq*Nk_padded*C FLOPs — padded blocks do real MXU
work, so they count).

Tunnel-aware timing (docs/BENCHMARKS.md): K kernel calls are chained
device-side via lax.scan inside ONE jit (so per-call dispatch RTT is
not measured), and the timed section ends in a 4-byte fetch of a
reduction of the LAST iteration's output (block_until_ready does not
synchronize through the tunneled backend).

Usage:
    python scripts/bench_matching_kernel.py [--nq 25920] [--nk 25920]
        [--objects 3] [--iters 20] [--tq 1024] [--tk 512] [--local]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nq", type=int, default=25920)   # 480p stride 4: 120x216
    p.add_argument("--nk", type=int, default=25920)
    p.add_argument("--objects", type=int, default=3)  # bg + 2, typical DAVIS
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--tq", type=int, default=None)
    p.add_argument("--tk", type=int, default=None)
    p.add_argument("--local", action="store_true",
                   help="bench the local-matching band kernel instead")
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke test via the Pallas interpreter "
                        "(correctness of the harness, not a benchmark)")
    p.add_argument("--two_stage_min", action="store_true",
                   help="global kernel: two-stage row-min variant")
    p.add_argument("--int8", action="store_true",
                   help="global kernel: int8-quantized cross term "
                        "(v5e int8 MXU peak is 2x bf16)")
    args = p.parse_args(argv)
    if args.int8 and args.two_stage_min:
        raise SystemExit(
            "--int8 has no two-stage row-min variant; drop one flag "
            "(refusing to silently bench a configuration that never ran)")

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if args.local:
        from cvpr2020_manet_tpu.ops.local_matching_pallas import (
            local_matching_pallas)
        h, w = 120, 216
        q = jnp.asarray(rng.standard_normal((h, w, args.channels)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((h, w, args.channels)),
                        jnp.bfloat16)
        onehot = jnp.asarray(
            rng.integers(0, 2, (h, w, args.objects)), jnp.float32)

        def body(carry, _):
            out = local_matching_pallas(carry, k, onehot,
                                        interpret=args.interpret)
            # feed a hint of the output back so scan iterations can't fold
            return carry + (0.0 * out[..., :1]).astype(carry.dtype), out

        @jax.jit
        def run(q):
            _, outs = jax.lax.scan(body, q, None, length=args.iters)
            return jnp.sum(outs[-1])

        flops_it = 2.0 * h * w * 31 * 31 * args.channels  # window 15 -> 31x31
        label = f"local_matching h{h} w{w} C{args.channels}"
    else:
        from cvpr2020_manet_tpu.ops.matching_pallas import (
            DEFAULT_TK, DEFAULT_TQ, global_matching_prepared,
            global_matching_prepared_int8, prepare_ref, prepare_ref_int8)
        tq = args.tq or DEFAULT_TQ
        tk = args.tk or DEFAULT_TK
        q = jnp.asarray(rng.standard_normal((args.nq, args.channels)),
                        jnp.float32 if args.int8 else jnp.bfloat16)
        ref = jnp.asarray(rng.standard_normal((args.nk, args.channels)),
                          jnp.float32 if args.int8 else jnp.bfloat16)
        labels = rng.integers(0, args.objects, (args.nk,))
        onehot = jnp.asarray(np.eye(args.objects)[labels], jnp.float32)
        prep = prepare_ref_int8 if args.int8 else prepare_ref
        match = (global_matching_prepared_int8 if args.int8
                 else global_matching_prepared)
        bucketed = jax.jit(
            lambda r, o: prep(r, o, block_k=tk))(ref, onehot)
        jax.block_until_ready(bucketed.block_obj)
        nkb = bucketed.block_obj.shape[0]

        def body(carry, _):
            kw = {} if args.int8 else dict(
                two_stage_min=args.two_stage_min)
            out = match(carry, bucketed, block_q=tq, block_k=tk,
                        interpret=args.interpret, **kw)
            return carry + (0.0 * out[:, :1]).astype(carry.dtype), out

        @jax.jit
        def run(q):
            _, outs = jax.lax.scan(body, q, None, length=args.iters)
            return jnp.sum(outs[-1])

        flops_it = 2.0 * args.nq * nkb * tk * args.channels
        label = (f"global_matching{'_int8' if args.int8 else ''} "
                 f"nq{args.nq} nk{args.nk} "
                 f"o{args.objects} TQ{tq} TK{tk} (nkb={nkb})")

    # compile + warm
    t0 = time.time()
    float(run(q))
    print(f"{label}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        float(run(q))
        dt = (time.time() - t0) / args.iters
        best = min(best, dt)
        print(f"  {dt * 1e3:.3f} ms/call  "
              f"{flops_it / dt / 1e12:.1f} TFLOP/s")
    print(f"best: {best * 1e3:.3f} ms/call, "
          f"{flops_it / best / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
