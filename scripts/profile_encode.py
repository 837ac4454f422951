"""Sub-stage device-time breakdown of the encoder (the 63% of the round).

profile_stages.py showed the production round is encode (63%) + matching
(34%); this decomposes encode itself — stem, the four ResNet stages,
ASPP, decoder+embedding — each slope-timed in isolation (two chain
lengths, fixed dispatch RTT cancels; see profile_stages.timed) with
analytic FLOPs per stage, so the ms AND the achieved TFLOP/s say which
stage is leaving MXU throughput on the table.

Stage inputs are materialized at their true shapes from the real
variables tree (standalone module applications over the same params),
so each stage compiles exactly the graph it runs inside extract_features.

Usage: python scripts/profile_encode.py [--frames 8] [--iters 16]
"""

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_flops(h, w, cin, cout, k):
    return 2.0 * h * w * cin * cout * k * k


def bottleneck_flops(h, w, cin, ch, stride, with_shortcut):
    """One Bottleneck at INPUT resolution (h, w)."""
    ho, wo = h // stride, w // stride
    f = conv_flops(h, w, cin, ch, 1)            # conv1 (pre-stride)
    f += conv_flops(ho, wo, ch, ch, 3)          # conv2 (strided)
    f += conv_flops(ho, wo, ch, ch * 4, 1)      # conv3
    if with_shortcut:
        f += conv_flops(ho, wo, cin, ch * 4, 1)
    return f


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu_tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu_tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.models import MANet
    from cvpr2020_manet_tpu.models.encoder import ASPP
    from cvpr2020_manet_tpu.models.resnet import Bottleneck, ResNetBackbone

    cfg = tiny_test_config() if args.cpu_tiny else Config()
    mc = cfg.model
    model = MANet(mc, matching_backend="jnp")
    h, w = cfg.eval.image_size
    hp, wp = h + (-h) % cfg.eval.pad_to, w + (-w) % cfg.eval.pad_to
    n = args.frames
    o = mc.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hp // 4, wp // 4, o)),
        jnp.zeros((1, hp // 4, wp // 4, o)))
    enc_p = variables["params"]["encoder"]
    dtype = jnp.dtype(mc.dtype)
    rng = np.random.default_rng(0)

    def timed(name, fn, x, flops_it=None):
        """Two-point slope timing (profile_stages.py's method)."""
        def body(c, _):
            c2, out = fn(c)
            return c2, jax.tree.map(lambda a: a.reshape(-1)[-1], out)

        def make(k):
            @jax.jit
            def run(x):
                c, outs = jax.lax.scan(body, x, None, length=k)
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
        ms = max((best_hi - best_lo) / (hi_n - lo_n), 1e-9) * 1e3
        tf = (flops_it / (ms / 1e3) / 1e12) if flops_it else None
        print(f"  {name:<16} {ms:8.3f} ms ({ms / n:6.3f} ms/frame"
              + (f", {tf:6.1f} TFLOP/s" if tf else "")
              + f", compile {compile_s:.0f}s)", flush=True)
        return ms

    print(f"profile_encode: {hp}x{wp} N={n} dtype={mc.dtype} "
          f"norm={mc.norm}", flush=True)

    # ---- stem (conv 7x7/2 + norm + relu + maxpool) --------------------- #
    bb = ResNetBackbone(depths=mc.backbone_depths, width=mc.backbone_width,
                        output_stride=mc.output_stride, norm=mc.norm,
                        gn_groups=mc.gn_groups, dtype=dtype)
    bb_p = enc_p["backbone"]

    # standalone stage modules reusing the SAME trained/initialized params
    from flax import linen as nn
    from cvpr2020_manet_tpu.models.layers import make_norm

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.astype(dtype)
            x = nn.Conv(mc.backbone_width, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=dtype, name="stem_conv")(x)
            x = make_norm(mc.norm, dtype, mc.gn_groups)(name="stem_norm")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    stem_p = {"stem_conv": bb_p["stem_conv"], "stem_norm": bb_p["stem_norm"]}
    imgs = jnp.asarray(rng.standard_normal((n, hp, wp, 3)), jnp.float32)
    stem = Stem()

    def run_stem(c):
        y = stem.apply({"params": stem_p}, c)
        return c + 0.0 * jnp.mean(y).astype(c.dtype), y

    fl = conv_flops(hp // 2, wp // 2, 3, mc.backbone_width, 7) * n
    timed("stem", run_stem, imgs, flops_it=fl)

    # ---- the four ResNet stages ---------------------------------------- #
    if mc.output_stride == 16:
        stage_cfg = [(1, 1), (2, 1), (2, 1), (1, 2)]
    else:
        stage_cfg = [(1, 1), (2, 1), (1, 2), (1, 4)]
    hh, ww = hp // 4, wp // 4          # after stem
    cin = mc.backbone_width
    cur_h, cur_w = hh, ww
    for stage, (n_blocks, (stride, dilation)) in enumerate(
            zip(mc.backbone_depths, stage_cfg)):
        ch = mc.backbone_width * (2 ** stage)

        class Stage(nn.Module):
            s_idx: int = stage
            n_b: int = n_blocks
            c: int = ch
            st: int = stride
            dil: int = dilation

            @nn.compact
            def __call__(self, x):
                for b in range(self.n_b):
                    mg = (1, 2, 4)[min(b, 2)] if (self.dil > 1) else 1
                    x = Bottleneck(
                        channels=self.c,
                        strides=self.st if b == 0 else 1,
                        dilation=self.dil * mg,
                        norm=mc.norm, gn_groups=mc.gn_groups, dtype=dtype,
                        name=f"stage{self.s_idx + 1}_block{b}")(x)
                return x

        sp = {k: v for k, v in bb_p.items()
              if k.startswith(f"stage{stage + 1}_")}
        xin = jnp.asarray(rng.standard_normal((n, cur_h, cur_w, cin)), dtype)
        st_mod = Stage()

        def run_stage(c, _m=st_mod, _p=sp):
            y = _m.apply({"params": _p}, c)
            return c + 0.0 * jnp.mean(y).astype(c.dtype), y

        fl = bottleneck_flops(cur_h, cur_w, cin, ch, stride, True)
        fl += (n_blocks - 1) * bottleneck_flops(
            cur_h // stride, cur_w // stride, ch * 4, ch, 1, False)
        timed(f"stage{stage + 1}(x{n_blocks})", run_stage, xin,
              flops_it=fl * n)
        cur_h, cur_w = cur_h // stride, cur_w // stride
        cin = ch * 4

    # ---- ASPP ----------------------------------------------------------- #
    aspp = ASPP(channels=mc.aspp_channels, norm=mc.norm,
                gn_groups=mc.gn_groups, dtype=dtype)
    trunk = jnp.asarray(rng.standard_normal((n, cur_h, cur_w, cin)), dtype)

    def run_aspp(c):
        y = aspp.apply({"params": enc_p["aspp"]}, c)
        return c + 0.0 * jnp.mean(y).astype(c.dtype), y

    ca = mc.aspp_channels
    fl = conv_flops(cur_h, cur_w, cin, ca, 1)           # 1x1 branch
    fl += 3 * conv_flops(cur_h, cur_w, cin, ca, 3)      # 3 atrous branches
    fl += conv_flops(1, 1, cin, ca, 1)                  # pooled branch
    fl += conv_flops(cur_h, cur_w, 5 * ca, ca, 1)       # projection
    timed("aspp", run_aspp, trunk, flops_it=fl * n)

    # ---- decoder + embedding (stride-4 fusion) -------------------------- #
    from cvpr2020_manet_tpu.models.layers import resize_bilinear

    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, yl):
            y, low = yl
            y = resize_bilinear(y, low.shape[1:3])
            ll = nn.Conv(mc.low_level_channels, (1, 1), use_bias=False,
                         dtype=dtype, name="low_level_proj")(low)
            ll_groups = math.gcd(mc.gn_groups, mc.low_level_channels)
            ll = nn.relu(make_norm(mc.norm, dtype, ll_groups)()(ll))
            y = jnp.concatenate([y, ll], axis=-1)
            for i in range(2):
                y = nn.Conv(mc.decoder_channels, (3, 3), use_bias=False,
                            dtype=dtype, name=f"decoder_conv{i}")(y)
                y = nn.relu(make_norm(mc.norm, dtype, mc.gn_groups)()(y))
            emb = nn.Conv(mc.embedding_dim, (1, 1), dtype=dtype,
                          name="embedding_head")(y)
            return y, emb

    dec_p = {k: v for k, v in enc_p.items() if k != "backbone"
             and k != "aspp"}
    low = jnp.asarray(rng.standard_normal(
        (n, hh, ww, mc.backbone_width * 4)), dtype)
    aspp_out = jnp.asarray(rng.standard_normal(
        (n, cur_h, cur_w, ca)), dtype)
    dec = Decoder()

    def run_dec(c):
        y, emb = dec.apply({"params": dec_p}, (c, low))
        return (c + 0.0 * jnp.mean(y).astype(c.dtype)
                + 0.0 * jnp.mean(emb).astype(c.dtype)), y

    cd, cl = mc.decoder_channels, mc.low_level_channels
    fl = conv_flops(hh, ww, mc.backbone_width * 4, cl, 1)
    fl += conv_flops(hh, ww, ca + cl, cd, 3)
    fl += conv_flops(hh, ww, cd, cd, 3)
    fl += conv_flops(hh, ww, cd, mc.embedding_dim, 1)
    timed("decoder+emb", run_dec, aspp_out, flops_it=fl * n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
