"""Streaming serving latency (BASELINE config 5): per-frame observe()
wall-clock at a given resolution with paged round memory.

    python scripts/bench_streaming.py --image_size 1080 1920 --frames 6
Prints one JSON line {"metric": "streaming_observe_p50_ms", ...}.
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
    p.add_argument("--image_size", type=int, nargs=2, default=(1080, 1920))
    p.add_argument("--frames", type=int, default=6, help="timed frames")
    p.add_argument("--corrections", type=int, default=1)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, tiny_test_config
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.streaming import StreamingIVOS
    from cvpr2020_manet_tpu.models import MANet

    base = tiny_test_config() if args.tiny else Config()
    cfg = dataclasses.replace(
        base, eval=dataclasses.replace(base.eval,
                                       image_size=tuple(args.image_size)))
    model = MANet(cfg.model, matching_backend="auto")
    h, w = cfg.eval.image_size
    hp = h + (-h) % cfg.eval.pad_to
    wp = w + (-w) % cfg.eval.pad_to
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hp // 4, wp // 4, o)), jnp.zeros((1, hp // 4, wp // 4, o)))
    s = StreamingIVOS(cfg, model, variables)
    s.reset(num_objects=2)

    ds = SyntheticDataset(image_size=(h, w), num_frames=args.frames + 2,
                          num_sequences=1, num_objects=2, scribble_sets=1)
    seq = ds.sequences()[0]
    # uint8 ingest path (raw RGB; the server normalizes on device)
    from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD
    frames = np.clip((ds.images(seq) * IMAGENET_STD + IMAGENET_MEAN) * 255.0,
                     0, 255).astype(np.uint8)

    # warm-up: compile observe + correct
    s.observe(frames[0])
    for _ in range(args.corrections):
        scr = ds.initial_scribbles(seq, 0).to_json()
        s.correct(scr)
    s.observe(frames[1])

    lat = []
    for i in range(args.frames):
        t0 = time.perf_counter()
        mask = s.observe(frames[(i + 2) % frames.shape[0]])
        mask.sum()
        lat.append(time.perf_counter() - t0)
    print(json.dumps({
        "metric": "streaming_observe_p50_ms",
        "value": round(1000 * float(np.median(lat)), 1),
        "unit": "ms/frame",
        "image_size": [h, w],
        "memory_pages": s.capacity,
        "fps": round(1.0 / float(np.median(lat)), 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
