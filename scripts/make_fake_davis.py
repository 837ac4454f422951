"""Generate a DAVIS-2017-*shaped* synthetic tree at realistic scale.

The dress rehearsal for the real-data parity run (VERDICT r3 #2): the
sandbox has no DAVIS data, so this builds a tree with the exact layout
`DavisEvalDataset` / `eval_davis` / the davisinteractive shim consume —
  JPEGImages/480p/<seq>/00000.jpg ...
  Annotations/480p/<seq>/00000.png ...   (palettized labels)
  Scribbles/<seq>/001..003.json          (robot-drawn initial sets,
                                          set-dependent annotated frame)
  ImageSets/2017/{val,train}.txt
— at DAVIS-val-realistic scale: 480x854, frame counts spanning every
frame bucket INCLUDING the ~100-frame one (the longest DAVIS val
sequences are ~100 frames; the 104 bucket had never been compiled or
timed on-chip before this rehearsal), multi-object with textured moving
squares (matchable even by untrained encoders, data/synthetic.py's
trick).

Frames are rendered and written one at a time in uint8 (a 100-frame
480p sequence held as float32 would be ~0.5 GB).

    python scripts/make_fake_davis.py --root /tmp/fake_davis
    python -m cvpr2020_manet_tpu.engine.eval_davis \
        --davis_root /tmp/fake_davis --rounds 8 --report /tmp/rehearsal.csv
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (frames, objects): spans the 32/64/104 frame buckets; the 52-frame
# sequence has ONE object (exercises the 1-bit mask pack path), others
# hit the default 4-wide object bucket.
SEQUENCES = [
    ("camel_like", 100, 2),
    ("judo_like", 69, 3),
    ("lone_goat", 52, 1),
    ("pigs_like", 38, 3),
    ("blackswan_like", 30, 2),
]


def write_sequence(root: str, name: str, t: int, n_obj: int, seed: int,
                   h: int = 480, w: int = 854) -> None:
    from PIL import Image

    from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
    from cvpr2020_manet_tpu.utils.colormap import davis_palette

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "JPEGImages", "480p", name)
    ann_dir = os.path.join(root, "Annotations", "480p", name)
    scr_dir = os.path.join(root, "Scribbles", name)
    for d in (img_dir, ann_dir, scr_dir):
        os.makedirs(d, exist_ok=True)

    # smooth background + per-object texture (uint8 throughout)
    yy = np.linspace(0, 1, h)[:, None, None]
    xx = np.linspace(0, 1, w)[None, :, None]
    bg = (40 + 40 * yy + 30 * xx
          + 25 * rng.random((h, w, 3))).astype(np.uint8)
    size = 120
    tex = [(128 + 127 * rng.random((size, size, 3))).astype(np.uint8)
           for _ in range(n_obj)]
    # linear drift that stays in-frame for all t frames
    starts, vels = [], []
    for _ in range(n_obj):
        vy = rng.uniform(-1.5, 1.5)
        vx = rng.uniform(-2.0, 2.0)
        y0 = rng.uniform(max(0, -vy * t), min(h - size, h - size - vy * t))
        x0 = rng.uniform(max(0, -vx * t), min(w - size, w - size - vx * t))
        starts.append((y0, x0))
        vels.append((vy, vx))

    pal = davis_palette().reshape(-1).tolist()
    gt_frames = {}
    for f in range(t):
        img = bg.copy()
        gt = np.zeros((h, w), np.uint8)
        for o in range(n_obj):
            y = int(round(starts[o][0] + vels[o][0] * f))
            x = int(round(starts[o][1] + vels[o][1] * f))
            y = min(max(y, 0), h - size)
            x = min(max(x, 0), w - size)
            img[y:y + size, x:x + size] = tex[o]
            gt[y:y + size, x:x + size] = o + 1
        Image.fromarray(img).save(os.path.join(img_dir, f"{f:05d}.jpg"),
                                  quality=90)
        m = Image.fromarray(gt, mode="P")
        m.putpalette(pal)
        m.save(os.path.join(ann_dir, f"{f:05d}.png"))
        gt_frames[f] = gt

    # 3 initial scribble sets, each annotating a different frame (the
    # robot plays the human, data/synthetic.py's convention)
    robot = InteractiveScribblesRobot()
    for s in range(3):
        frame = (s * (t // 3)) % t
        scr = robot.scribble_frame(
            np.zeros((h, w), np.int32), gt_frames[frame].astype(np.int32),
            n_obj, frame, t, name)
        with open(os.path.join(scr_dir, f"{s + 1:03d}.json"), "w") as fp:
            json.dump(scr.to_json(), fp)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args(argv)

    names = []
    for i, (name, t, n_obj) in enumerate(SEQUENCES):
        write_sequence(args.root, name, t, n_obj, args.seed + i)
        names.append(name)
        print(f"{name}: {t} frames, {n_obj} objects", flush=True)
    sets_dir = os.path.join(args.root, "ImageSets", "2017")
    os.makedirs(sets_dir, exist_ok=True)
    listing = "".join(n + "\n" for n in names)
    with open(os.path.join(sets_dir, "val.txt"), "w") as f:
        f.write(listing)
    with open(os.path.join(sets_dir, "train.txt"), "w") as f:
        f.write(listing)
    print(f"tree at {args.root}: {len(names)} sequences, "
          f"{sum(t for _, t, _ in SEQUENCES)} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
