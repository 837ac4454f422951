"""Execute a TPU-lowered `.ivosx` serving bundle ON THE CHIP (VERDICT r4 #4).

tests/test_export.py pins that (a) TPU cross-lowering embeds the Pallas
matching kernels and (b) CPU bundles execute and match the direct model
chain — but a TPU artifact had never been *run*. This script closes the
last unverified link in the serving story (docs/SERVING.md): it exports
the flagship 480p serving bundle for platform 'tpu' (production Pallas
matching), loads it back from disk, drives ONE FULL interactive round
through the five bundle entries on a synthetic 480p sequence, compares
the argmax masks BITWISE against the direct `model.apply` chain, and
times the bundle-driven round.

    python scripts/run_artifact_tpu.py [--frames 8] [--objects 3]
        [--release DIR] [--keep /tmp/flagship.ivosx] [--tiny --cpu]

One JSON line at the end: parity + latency for docs/SERVING.md.
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
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--objects", type=int, default=3,
                   help="object bucket EXCLUDING background (evaluator "
                        "production bucket: 4-wide)")
    p.add_argument("--release", default=None,
                   help="orbax release dir for trained params "
                        "(random init otherwise — parity/latency do not "
                        "depend on the weights)")
    p.add_argument("--keep", default=None,
                   help="write the bundle here (default: a temp file)")
    p.add_argument("--rounds", type=int, default=3,
                   help="timed bundle-driven rounds (first is compile)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config smoke (pair with --cpu off-TPU)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.models import MANet
    from cvpr2020_manet_tpu.utils import export as ex

    platform = jax.default_backend()
    cfg = tiny_test_config() if args.tiny else Config()
    h, w = cfg.eval.image_size
    pad_to = cfg.eval.pad_to
    hp, wp = h + (-h) % pad_to, w + (-w) % pad_to
    hh, ww = hp // 4, wp // 4
    o = args.objects + 1
    backend = "pallas" if platform == "tpu" else "pallas_interpret"
    model = MANet(cfg.model, matching_backend=backend)

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hh, ww, cfg.model.max_objects + 1)),
        jnp.zeros((1, hh, ww, cfg.model.max_objects + 1)))
    if args.release:
        from cvpr2020_manet_tpu.utils.checkpoint import load_release
        variables = {**variables,
                     "params": load_release(variables["params"],
                                            args.release)}

    # ---- export: lower + serialize the five-entry serving bundle ------
    t0 = time.perf_counter()
    exports = ex.export_serving_bundle(
        model, variables, (h, w), args.objects,
        platforms=(platform,), pad_to=pad_to)
    path = args.keep or "/tmp/flagship_tpu.ivosx"
    manifest = ex.save_bundle(
        exports, path, extra={"image_size": [h, w], "objects": args.objects})
    t_export = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / 1e6
    print(f"bundle exported: {path} ({size_mb:.1f} MB, "
          f"{t_export:.1f}s, platforms={manifest['entries']['propagate']['platforms']})",
          flush=True)

    bundle = ex.load_bundle(path)

    # ---- synthetic 480p task ------------------------------------------
    rng = np.random.default_rng(7)
    # the bundle's extract entry takes RAW uint8 RGB (normalize on
    # device — export_serving_bundle's default image contract)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.frames, h, w, 3)), jnp.uint8)
    pos = jnp.zeros((hh, ww, o)).at[8:24, 8:40, 1].set(1.0)
    if o > 2:
        pos = pos.at[40:56, 60:90, 2].set(1.0)
    neg = jnp.zeros((hh, ww, o))
    bg = jnp.zeros((hh, ww, o)).at[..., 0].set(1.0)
    obj_valid = jnp.ones((o,), jnp.float32)

    def drive(entries):
        """One full interactive round via the five-entry contract:
        extract all frames, interact on frame 0, aggregate_first, then
        propagate 1..T-1 frame-chained (prev = last prediction), gmap
        min-fused exactly like engine/evaluator.py 'min_fused'."""
        feats, embs = [], []
        for t in range(args.frames):
            f, e = entries["extract"](frames[t])
            feats.append(f), embs.append(e)
        int_feats, probs0 = entries["interact"](feats[0], pos, neg, bg)
        mem = entries["aggregate_first"](int_feats)
        lab0 = jnp.argmax(probs0, axis=-1)
        ref_onehot = jax.nn.one_hot(
            lab0.reshape(-1), o, dtype=jnp.float32)
        ref_emb = embs[0].reshape(-1, embs[0].shape[-1])
        gmap = jnp.ones((hh, ww, o), jnp.float32)
        masks, prev_probs, prev_emb = [np.asarray(lab0)], probs0, embs[0]
        for t in range(1, args.frames):
            probs, gmap = entries["propagate"](
                feats[t], embs[t], ref_emb, ref_onehot, gmap,
                prev_emb, prev_probs, mem, obj_valid)
            masks.append(np.asarray(jnp.argmax(probs, axis=-1)))
            prev_probs, prev_emb = probs, embs[t]
        return np.stack(masks)

    # bundle-driven (timed; round 0 pays the StableHLO compile)
    bundle_entries = {n: bundle[n] for n in bundle.names}
    times = []
    for r in range(max(2, args.rounds)):
        t0 = time.perf_counter()
        bundle_masks = drive(bundle_entries)
        times.append(time.perf_counter() - t0)
        print(f"bundle round {r}: {times[-1]:.2f}s", flush=True)

    # direct model.apply chain (jitted closures over the same params)
    fns = ex.build_serving_fns(model, variables, (h, w), args.objects,
                               pad_to=pad_to)
    fns = dict(fns, extract=ex.wrap_raw_image(*fns["extract"]))
    direct_entries = {n: jax.jit(fn) for n, (fn, _) in fns.items()}
    direct_masks = drive(direct_entries)

    bitwise = bool((bundle_masks == direct_masks).all())
    agree = float((bundle_masks == direct_masks).mean())
    warm = sorted(times[1:])[0]
    rec = {
        "metric": "ivosx_bundle_round",
        "platform": platform,
        "image_size": [h, w],
        "frames": args.frames,
        "object_bucket": o,
        "bundle_mb": round(size_mb, 1),
        "export_s": round(t_export, 1),
        "warm_round_s": round(warm, 3),
        "fps_equiv": round(args.frames / warm, 1),
        "mask_parity_bitwise": bitwise,
        "mask_agreement": round(agree, 6),
    }
    print(json.dumps(rec))
    if not bitwise and agree < 0.999:
        print("FAIL: bundle masks diverge from direct model.apply",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
