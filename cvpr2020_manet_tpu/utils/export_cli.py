"""Export CLI (`manet-export` / scripts/export_model.py): AOT-lowered
serving artifacts (.ivosx) — see utils/export.py and docs/SERVING.md.

Examples:
  # flagship 480p, 4-object bucket, TPU artifact (Pallas matching kernels)
  manet-export --out manet_480p.ivosx

  # portable CPU+TPU artifact (jnp matching) from a release checkpoint
  manet-export --out manet.ivosx --platforms cpu,tpu \
      --matching_backend jnp --release /ckpts/release

  # round-trip self-check (loads the file back, compares vs direct apply)
  manet-export --out /tmp/m.ivosx --tiny --check \
      --platforms cpu --matching_backend jnp
"""

import argparse
import json

import numpy as np


def _rand_like(rng, a):
    """Random check input matching an example arg's shape/dtype."""
    import jax.numpy as jnp
    if np.issubdtype(np.dtype(a.dtype), np.integer):
        return jnp.asarray(rng.integers(0, 256, a.shape), a.dtype)
    return jnp.asarray(rng.standard_normal(a.shape), a.dtype)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=854)
    p.add_argument("--objects", type=int, default=None,
                   help="object bucket (default: config max_objects)")
    p.add_argument("--platforms", default="tpu",
                   help="comma list; multi-platform requires jnp matching")
    p.add_argument("--matching_backend", default="auto")
    p.add_argument("--release", default=None,
                   help="load params from an export_release directory")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CI / smoke)")
    p.add_argument("--bundle", action="store_true",
                   help="write a serving BUNDLE (extract/interact/"
                        "aggregate/propagate graphs) instead of the "
                        "single fused round artifact")
    p.add_argument("--image_format", default=None,
                   choices=["uint8", "float32", "yuv420"],
                   help="artifact image contract: uint8 RGB (default), "
                        "pre-normalized float32, or the decoder's planar "
                        "YUV 4:2:0 (y, uv) pair at half the RGB bytes")
    p.add_argument("--float_image", action="store_true",
                   help="image input stays normalized float32 (default: "
                        "raw uint8 RGB, normalization inside the graph)")
    p.add_argument("--check", action="store_true",
                   help="load the artifact back and compare vs direct apply")
    args = p.parse_args(argv)

    import jax
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    if "tpu" not in platforms:
        # CPU-only artifacts never need the device; pin the platform so
        # param init doesn't dispatch through the sandbox's default
        # (tunneled-TPU) backend.
        try:
            jax.config.update("jax_platforms", ",".join(platforms))
        except RuntimeError:
            pass  # backends already initialized (e.g. under pytest)
    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.models import MANet
    from cvpr2020_manet_tpu.utils import export as ex

    cfg = tiny_test_config() if args.tiny else Config()
    h, w = (cfg.eval.image_size if args.tiny else (args.height, args.width))
    num_objects = (args.objects if args.objects is not None
                   else cfg.model.max_objects)
    o = cfg.model.max_objects + 1
    pad_to = cfg.eval.pad_to

    model = MANet(cfg.model, matching_backend=args.matching_backend)
    hp, wp = h + (-h) % pad_to, w + (-w) % pad_to
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hp // 4, wp // 4, o)), jnp.zeros((1, hp // 4, wp // 4, o)))
    if args.release:
        from cvpr2020_manet_tpu.utils.checkpoint import load_release
        variables = dict(variables,
                         params=load_release(variables["params"], args.release))

    fmt = args.image_format or ("float32" if args.float_image else "uint8")
    extra = {
        # image_size + pad_to + feature_stride define the artifact's
        # spatial contract: the scribble/probability grid is
        # (H + (-H) % pad_to) // stride per side
        "image_size": [h, w], "pad_to": pad_to, "feature_stride": 4,
        "image_input": {"uint8": "uint8_rgb",
                        "float32": "normalized_float32",
                        "yuv420": "yuv420_planar"}[fmt],
        "num_objects": num_objects,
        "matching_backend": args.matching_backend,
        "release": args.release or "",
    }
    if args.bundle:
        exports = ex.export_serving_bundle(model, variables, (h, w),
                                           num_objects, platforms=platforms,
                                           pad_to=pad_to, image_format=fmt)
        manifest = ex.save_bundle(exports, args.out, extra=extra)
    else:
        exported = ex.export_forward(model, variables, (h, w), num_objects,
                                     platforms=platforms, pad_to=pad_to,
                                     image_format=fmt)
        manifest = ex.save_artifact(exported, args.out, extra=extra)
    print(json.dumps(manifest, sort_keys=True))

    if args.check and args.bundle:
        bundle = ex.load_bundle(args.out)
        fns = ex.build_serving_fns(model, variables, (h, w), num_objects,
                                   pad_to=pad_to)
        if fmt == "uint8":
            fns = dict(fns, extract=ex.wrap_raw_image(*fns["extract"]))
        elif fmt == "yuv420":
            fns = dict(fns, extract=ex.wrap_yuv420_image(*fns["extract"]))
        rng = np.random.default_rng(0)
        for name in bundle.names:
            fn, example_args = fns[name]
            argv_ = [_rand_like(rng, a) for a in example_args]
            got = jax.tree.map(np.asarray, bundle[name](*argv_))
            want = jax.tree.map(np.asarray, jax.jit(fn)(*argv_))
            jax.tree.map(lambda g, w_: np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w_, np.float32),
                atol=1e-5), got, want)
        print("check: all bundle entries match direct apply")
    elif args.check:
        loaded = ex.load_artifact(args.out)
        fn, example_args = ex.build_round_forward(
            model, variables, (h, w), num_objects, pad_to=pad_to)
        if fmt == "uint8":
            fn, example_args = ex.wrap_raw_image(fn, example_args)
        elif fmt == "yuv420":
            fn, example_args = ex.wrap_yuv420_image(fn, example_args)
        rng = np.random.default_rng(0)
        argv_ = [_rand_like(rng, a) for a in example_args]
        got = np.asarray(loaded(*argv_))
        want = np.asarray(jax.jit(fn)(*argv_))
        np.testing.assert_allclose(got, want, atol=1e-5)
        print("check: artifact output matches direct apply")


if __name__ == "__main__":
    main()
