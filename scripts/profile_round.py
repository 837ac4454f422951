"""Decompose the interactive-round wall clock on the live TPU.

Times, per round (after warm-up):
  host_prep   — scribble rasterize + numpy prep
  device_only — round dispatch + device compute, forced by a 1-element
                probe transfer (no mask download)
  full        — run_round as shipped (includes packed-mask download+unpack)

Usage: python scripts/profile_round.py [--frames 16] [--rounds 6]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from cvpr2020_manet_tpu.config import Config, EvalConfig
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
    from cvpr2020_manet_tpu.interactive.scribbles import (
        annotated_frames, scribbles2mask)
    from cvpr2020_manet_tpu.models import MANet

    cfg = Config(eval=EvalConfig(max_frames=args.frames))
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    ds = SyntheticDataset(image_size=(h, w), num_frames=args.frames,
                          num_sequences=1, num_objects=2, scribble_sets=1)
    seq = ds.sequences()[0]
    gt = ds.gt_masks(seq)

    model = MANet(cfg.model, matching_backend="auto")
    hh = (h + (-h) % cfg.eval.pad_to) // 4
    ww = (w + (-w) % cfg.eval.pad_to) // 4
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h + (-h) % cfg.eval.pad_to,
                   w + (-w) % cfg.eval.pad_to, 3)),
        jnp.zeros((1, hh, ww, o)), jnp.zeros((1, hh, ww, o)))

    ev = Evaluator(cfg, model, variables)
    state = ev.start_sequence(ds.images(seq), ds.num_objects(seq))
    robot = InteractiveScribblesRobot()
    masks = np.zeros_like(gt)

    # warm-up (compiles)
    for _ in range(2):
        scr = robot.interact(seq, masks, gt, ds.num_objects(seq))
        masks = ev.run_round(state, scr.to_json(), gt.shape[1:],
                             ds.num_objects(seq))

    host_prep, device_only, full, robot_t, unpack_t = [], [], [], [], []
    from cvpr2020_manet_tpu.engine.evaluator import (
        mask_bits_for_labels, unpack_labels)
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        scr = robot.interact(seq, masks, gt, ds.num_objects(seq))
        robot_t.append(time.perf_counter() - t0)

        sj = scr.to_json()
        # ---- host prep ----
        t0 = time.perf_counter()
        af = annotated_frames(sj)
        annot = af[0] if af else 0
        one = {"sequence": sj["sequence"],
               "scribbles": [sj["scribbles"][annot]]}
        raster = scribbles2mask(one, gt.shape[1:])[0]
        raster = np.pad(raster,
                        [(0, (-gt.shape[1]) % cfg.eval.pad_to),
                         (0, (-gt.shape[2]) % cfg.eval.pad_to)],
                        constant_values=-1)
        raster8 = np.asarray(raster, np.int8)
        host_prep.append(time.perf_counter() - t0)

        # ---- device only: same round args, force with 1-byte probe ----
        o_bucket = state.prev_masks.shape[-1]
        obj_valid = np.zeros((o_bucket,), np.float32)
        obj_valid[:ds.num_objects(seq) + 1] = 1.0
        t_bucket = state.feat.shape[0]
        frame_valid = (np.arange(t_bucket) < state.num_frames)
        ms = cfg.eval.mask_stride
        h_pad = (gt.shape[1] + ((-gt.shape[1]) % cfg.eval.pad_to)) // ms
        w_pad = (gt.shape[2] + ((-gt.shape[2]) % cfg.eval.pad_to)) // ms
        pk = mask_bits_for_labels(ds.num_objects(seq) + 1)
        t0 = time.perf_counter()
        probs, gmap, int_mem, mk = ev._round(
            state.feat, state.emb, jnp.asarray(raster8),
            jnp.asarray(annot, jnp.int32), state.prev_masks,
            state.gmap_mem, state.int_mem, jnp.asarray(False),
            jnp.asarray(obj_valid), jnp.asarray(frame_valid),
            mask_hw=(h_pad, w_pad), pack=pk)
        probe = np.asarray(mk[0, 0, :1])   # forces completion, ~1 B
        t1 = time.perf_counter()
        device_only.append(t1 - t0)
        mk_np = np.asarray(mk)             # the actual download
        t2 = time.perf_counter()
        full.append(t2 - t0)
        t0 = time.perf_counter()
        lab = unpack_labels(mk_np[:state.num_frames], pk)
        unpack_t.append(time.perf_counter() - t0)
        masks = lab[:, :gt.shape[1], :gt.shape[2]].astype(np.int32)
        state.prev_masks, state.gmap_mem, state.int_mem = probs, gmap, int_mem

    def p50(x):
        return float(np.median(x) * 1000)

    print(f"frames={args.frames} o_bucket={o_bucket} "
          f"packed_bytes={mk_np.nbytes}")
    print(f"robot      p50 {p50(robot_t):7.1f} ms   (not charged to round)")
    print(f"host_prep  p50 {p50(host_prep):7.1f} ms")
    print(f"device+rtt p50 {p50(device_only):7.1f} ms")
    print(f"mask xfer  p50 {p50(full) - p50(device_only):7.1f} ms")
    print(f"unpack     p50 {p50(unpack_t):7.1f} ms")
    print(f"full round p50 {p50(full):7.1f} ms -> "
          f"{args.frames / (p50(full) / 1000):.1f} fps "
          f"(+prep: {args.frames / ((p50(full) + p50(host_prep)) / 1000):.1f})")


if __name__ == "__main__":
    main()
