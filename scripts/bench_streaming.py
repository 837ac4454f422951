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
    p.add_argument("--pages", type=int, default=None,
                   help="matching-memory pages (eval.max_interactions): "
                        "the unbounded-memory-growth axis")
    p.add_argument("--num_objects", type=int, default=2)
    p.add_argument("--ingest", choices=["rgb", "yuv420"], default="rgb",
                   help="frame format: yuv420 ships the decoder's planar "
                        "(y, uv) pair at half the RGB bytes (pre-packed "
                        "outside the timed loop — the decoder path)")
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
    eval_kw = {"image_size": tuple(args.image_size)}
    if args.pages is not None:
        eval_kw["max_interactions"] = args.pages
    cfg = dataclasses.replace(
        base, eval=dataclasses.replace(base.eval, **eval_kw))
    model = MANet(cfg.model, matching_backend="auto")
    h, w = cfg.eval.image_size
    hp = h + (-h) % cfg.eval.pad_to
    wp = w + (-w) % cfg.eval.pad_to
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3)),
        jnp.zeros((1, hp // 4, wp // 4, o)), jnp.zeros((1, hp // 4, wp // 4, o)))
    s = StreamingIVOS(cfg, model, variables)
    s.reset(num_objects=args.num_objects)

    ds = SyntheticDataset(image_size=(h, w), num_frames=args.frames + 2,
                          num_sequences=1, num_objects=args.num_objects,
                          scribble_sets=1)
    seq = ds.sequences()[0]
    # uint8 ingest path (raw RGB; the server normalizes on device)
    from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD
    frames = np.clip((ds.images(seq) * IMAGENET_STD + IMAGENET_MEAN) * 255.0,
                     0, 255).astype(np.uint8)
    if args.ingest == "yuv420":
        # pre-pack outside every timed loop: production input arrives
        # planar from the video decoder (utils/ingest.py)
        from cvpr2020_manet_tpu.utils.ingest import rgb_to_yuv420_host
        ph, pw = h + h % 2, w + w % 2
        ys, uvs = rgb_to_yuv420_host(
            np.pad(frames, ((0, 0), (0, ph - h), (0, pw - w), (0, 0))))
        frames = [(ys[i], uvs[i]) for i in range(ys.shape[0])]
        frames_len = ys.shape[0]
    else:
        frames_len = frames.shape[0]

    # warm-up: compile observe + correct
    s.observe(frames[0])
    for _ in range(args.corrections):
        scr = ds.initial_scribbles(seq, 0).to_json()
        s.correct(scr)
    s.observe(frames[1])

    # synchronous per-frame latency: upload + compute + download serialized
    lat = []
    for i in range(args.frames):
        t0 = time.perf_counter()
        mask = s.observe(frames[(i + 2) % frames_len])
        mask.sum()
        lat.append(time.perf_counter() - t0)

    # pipelined steady-state: frames issued back-to-back via
    # observe_async; each frame's mask download overlaps the later frames'
    # upload + compute (the streaming-serving operating point)
    futs = []
    t0 = time.perf_counter()
    for i in range(args.frames):
        futs.append(s.observe_async(frames[(i + 2) % frames_len]))
    for f in futs:
        f.result().sum()
    pipe_ms = 1000 * (time.perf_counter() - t0) / args.frames

    print(json.dumps({
        "metric": "streaming_observe_p50_ms",
        "value": round(1000 * float(np.median(lat)), 1),
        "unit": "ms/frame",
        "image_size": [h, w],
        "memory_pages": s.capacity,
        "live_pages": s.live_pages(),
        "num_objects": args.num_objects,
        "mask_bits": s._bits,
        "fps": round(1.0 / float(np.median(lat)), 2),
        "pipelined_ms_per_frame": round(pipe_ms, 1),
        "pipelined_fps": round(1000.0 / pipe_ms, 2),
        "ingest": args.ingest,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
