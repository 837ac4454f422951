"""Per-stage device-time breakdown of the 480p interactive round.

Decomposes the production round (16-frame bucket, 4-wide object bucket,
flagship dims) into its device stages and times each in ISOLATION with
the tunnel-aware harness (scan-chained iterations inside one jit, timed
section ends in a 4-byte fetch — bench_matching_kernel.py's recipe):

  encode        ResNet-101+ASPP+decoder+emb, one 8-frame chunk
  prepare_ref   bucketing sort of the annotated frame's 25920 rows
  matching      batched global matching, (T-1) frames in one kernel call
  sweep_step    the (T-1)-step lax.scan of local matching + decomposed
                head + softmax (matching hoisted out via gmap_override)
  mask_pack     upsample + argmax + bit-pack of all T masks

The sum approximates bench.py's device_path round time; the residual is
memory scatters/updates + inter-dispatch gaps. Also prints a
round-level TFLOP/s from the matching kernel's padded FLOPs (the only
MXU-saturating stage).

Usage: python scripts/profile_stages.py [--frames 16] [--iters 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu_tiny", action="store_true",
                   help="tiny shapes on CPU (harness smoke, not a bench)")
    p.add_argument("--int8", action="store_true",
                   help="ALSO slope-time the int8 matching stage pair "
                        "(prepare_ref_int8 + matching_int8) at the same "
                        "shapes — the round-level device answer the "
                        "chained-round differencing cannot resolve "
                        "(docs/BENCHMARKS.md round-5 int8 section)")
    args = p.parse_args(argv)

    import jax
    if args.cpu_tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.models import MANet

    cfg = tiny_test_config() if args.cpu_tiny else Config()
    backend = "jnp" if args.cpu_tiny else "pallas"
    model = MANet(cfg.model, matching_backend=backend)
    h, w = cfg.eval.image_size
    hp, wp = h + (-h) % cfg.eval.pad_to, w + (-w) % cfg.eval.pad_to
    hh, ww = hp // 4, wp // 4
    o = 4 if not args.cpu_tiny else cfg.model.max_objects + 1
    t = args.frames
    ce = cfg.model.embedding_dim_padded
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hh, ww, cfg.model.max_objects + 1)),
        jnp.zeros((1, hh, ww, cfg.model.max_objects + 1)))
    dtype = jnp.dtype(cfg.model.dtype)

    rng = np.random.default_rng(0)
    rows = []

    def timed(name, fn, x, per=1.0, flops_it=None):
        """fn: (carry) -> (carry, out); scan-chained, TWO-POINT timed.

        Each dispatch of the chained graph carries a fixed host/tunnel
        overhead (measured ~28 ms dispatch+fetch RTT on the sandbox link)
        that single-count timing folds into every stage — at the old
        iters=8 that inflated each stage by ~3.6 ms and made the 0.4 ms
        prepare_ref read as 4.4 ms. Timing the SAME graph at two
        iteration counts and reporting the slope
        (t_hi - t_lo) / (iters_hi - iters_lo) cancels the fixed term and
        yields the true marginal device time per iteration."""
        def body(c, _):
            c2, out = fn(c)
            # reduce each output leaf to ONE element before the scan
            # stacks it: the carry bump inside fn already forces the full
            # computation, and stacking wide outputs over `length`
            # iterations OOMs HBM at the high count (96 matching outputs
            # = 19 GB).
            return c2, jax.tree.map(lambda a: a.reshape(-1)[-1], out)

        def make(n):
            @jax.jit
            def run(x):
                c, outs = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(
                    jax.tree.leaves(outs)[-1][-1].astype(jnp.float32))
            return run

        lo_n, hi_n = args.iters, args.iters * 4
        run_lo, run_hi = make(lo_n), make(hi_n)
        t0 = time.time()
        float(run_lo(x))
        compile_s = time.time() - t0
        float(run_hi(x))
        best_lo = best_hi = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            float(run_lo(x))
            best_lo = min(best_lo, time.time() - t0)
            t0 = time.time()
            float(run_hi(x))
            best_hi = min(best_hi, time.time() - t0)
        best = max((best_hi - best_lo) / (hi_n - lo_n), 1e-9)
        fixed_ms = max(best_lo - lo_n * best, 0.0) * 1e3
        tf = (flops_it / best / 1e12) if flops_it else None
        rows.append((name, best * 1e3 / per, best * 1e3, tf))
        print(f"  {name:<12} {best * 1e3 / per:8.3f} ms/unit  "
              f"({best * 1e3:.2f} ms/iter marginal, fixed {fixed_ms:.1f} ms"
              f", compile {compile_s:.0f}s"
              + (f", {tf:.1f} TFLOP/s" if tf else "") + ")", flush=True)

    print(f"profile_stages: {h}x{w} T={t} O={o} C={ce} backend={backend}",
          flush=True)

    # --- encode: one 8-frame chunk ------------------------------------- #
    chunk = min(8, t)
    imgs = jnp.asarray(rng.standard_normal((chunk, hp, wp, 3)), jnp.float32)

    def enc(c):
        f, e = model.apply(variables, c, method=model.extract_features)
        return c + 0.0 * jnp.mean(f).astype(c.dtype), (f, e)

    timed(f"encode({chunk}f)", enc, imgs, per=chunk)

    # shared tensors at production shapes
    feat_c = cfg.model.decoder_channels
    feat = jnp.asarray(rng.standard_normal((t, hh, ww, feat_c)), dtype)
    emb = jnp.asarray(rng.standard_normal((t, hh, ww, ce)), dtype)
    labels = rng.integers(0, o, (hh * ww,))
    onehot = jnp.asarray(np.eye(o)[labels], jnp.float32)
    prev = jnp.zeros((hh, ww, o), jnp.float32).at[..., 0].set(1.0)
    int_mem = jnp.asarray(
        rng.standard_normal((o, hh, ww, cfg.model.ma_channels)), jnp.float32)
    ov = jnp.ones((o,), jnp.float32)

    if backend == "pallas":
        from cvpr2020_manet_tpu.ops.matching_pallas import (
            global_matching_prepared, prepare_ref)

        # --- prepare_ref (per-round bucketing sort) -------------------- #
        def prep(e0):
            b = prepare_ref(e0.reshape(-1, ce), onehot)
            return e0 + 0.0 * jnp.mean(
                b.neg2pixels).astype(e0.dtype), b.neg2pixels

        timed("prepare_ref", prep, emb[0])

        bucketed = jax.jit(lambda e: prepare_ref(e.reshape(-1, ce),
                                                 onehot))(emb[0])
        jax.block_until_ready(bucketed.neg2pixels)
        nkb = bucketed.block_obj.shape[0]
        from cvpr2020_manet_tpu.ops.matching_pallas import DEFAULT_TK

        # --- batched global matching ((T-1) frames, one call) ---------- #
        q_all = emb[1:].reshape(-1, ce)

        def match(q):
            out = global_matching_prepared(q, bucketed)
            return q + (0.0 * out[:, :1]).astype(q.dtype), out

        flops = 2.0 * q_all.shape[0] * nkb * DEFAULT_TK * ce
        timed(f"matching({t - 1}f)", match, q_all, per=t - 1,
              flops_it=flops)

        if args.int8:
            from cvpr2020_manet_tpu.ops.matching_pallas import (
                global_matching_prepared_int8, prepare_ref_int8)

            def prep8(e0):
                b = prepare_ref_int8(e0.reshape(-1, ce), onehot)
                return e0 + 0.0 * jnp.mean(
                    b.pixels.astype(jnp.float32)).astype(e0.dtype), b.sqnorm

            timed("prepare_ref_int8", prep8, emb[0])

            bucketed8 = jax.jit(lambda e: prepare_ref_int8(
                e.reshape(-1, ce), onehot))(emb[0])
            jax.block_until_ready(bucketed8.pixels)

            def match8(q):
                out = global_matching_prepared_int8(q, bucketed8)
                return q + (0.0 * out[:, :1]).astype(q.dtype), out

            timed(f"matching_int8({t - 1}f)", match8, q_all, per=t - 1,
                  flops_it=flops)

    # --- sweep scan minus matching (local + head + softmax) ------------ #
    head_fp = model.apply(variables, feat, method=model.head_feat_contrib)
    head_mp = model.apply(variables, int_mem, method=model.head_mem_contrib)
    gm_pre = jnp.asarray(rng.random((t - 1, hh, ww, o)), jnp.float32)

    def sweep(carry):
        def step(c, xs):
            f_t, e_t, e_prev, g_pre, fp_t = xs
            logits, g = model.apply(
                variables, f_t, e_t, emb[0].reshape(-1, ce), onehot, None,
                jnp.ones((hh, ww, o), jnp.float32), e_prev, c, int_mem,
                ov, method=model.propagate, gmap_override=g_pre,
                head_pre=fp_t[None] + head_mp)
            return jax.nn.softmax(logits, -1), g
        out, gs = jax.lax.scan(
            step, carry, (feat[1:], emb[1:], emb[:-1], gm_pre, head_fp[1:]))
        return out, gs

    timed(f"sweep_step(x{t - 1})", sweep, prev, per=t - 1)

    # --- mask upsample + argmax + pack --------------------------------- #
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    ev = Evaluator.__new__(Evaluator)   # only _masks_impl is needed
    probs = jnp.asarray(rng.random((t, hh, ww, o)), jnp.float32)

    def pack(pr):
        mk = ev._masks_impl(pr, hw=(hp, wp), pack=2)
        return pr + 0.0 * jnp.mean(mk.astype(jnp.float32)), mk

    timed(f"mask_pack({t}f)", pack, probs, per=t)

    total = sum(call for _, _, call, _ in rows[1:])  # encode is per-video
    print(f"round stages total (excl. encode): {total:.1f} ms/round",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
