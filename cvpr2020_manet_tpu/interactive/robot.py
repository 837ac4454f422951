"""Interactive scribbles robot (SURVEY.md C20, the `davisinteractive`
`robot.InteractiveScribblesRobot` capability).

Protocol role (HIGH confidence, SURVEY.md §1): after each round the service
(1) scores every frame, (2) picks the worst frame, (3) simulates human
corrective scribbles on that frame's error regions, and returns them.

Implementation note: davisinteractive skeletonizes each error region
(skimage) and walks the skeleton graph (networkx). skimage is not in this
image, so the same intent — "a polyline along the spine of the largest
error region, safely inside it" — is realized with SciPy + BFS geodesics:
erode the region, take the largest connected component, then take the
(approximate) graph diameter path via double-BFS over component pixels.
Semantics are pinned by tests (scribbles lie inside the error region, are
long enough, and label the correct object).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
from scipy import ndimage

from cvpr2020_manet_tpu.interactive.metrics import jf_per_frame
from cvpr2020_manet_tpu.interactive.scribbles import Scribbles


@dataclasses.dataclass(frozen=True)
class RobotParams:
    kernel_size: float = 0.15      # erosion kernel, relative to region size
    min_region_pixels: int = 10    # ignore smaller error regions
    min_path_nodes: int = 3        # drop degenerate scribbles
    sample_every: int = 4          # polyline subsampling stride (pixels)
    max_objects_per_round: int = 4 # scribble at most this many objects


_NEIGH = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
          (0, 1), (1, -1), (1, 0), (1, 1)]


def _bfs_farthest(component: np.ndarray, start: tuple[int, int]):
    """BFS over 8-connected True pixels; returns (farthest pixel, parents)."""
    h, w = component.shape
    dist = np.full((h, w), -1, np.int32)
    parent = {}
    dist[start] = 0
    queue = [start]
    far = start
    while queue:
        nxt = []
        for (y, x) in queue:
            for dy, dx in _NEIGH:
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w and component[yy, xx] \
                        and dist[yy, xx] < 0:
                    dist[yy, xx] = dist[y, x] + 1
                    parent[(yy, xx)] = (y, x)
                    nxt.append((yy, xx))
                    if dist[yy, xx] > dist[far]:
                        far = (yy, xx)
        queue = nxt
    return far, parent


def _diameter_path(component: np.ndarray) -> List[tuple[int, int]]:
    """Approximate longest geodesic path through a connected component."""
    ys, xs = np.nonzero(component)
    seed = (int(ys[0]), int(xs[0]))
    a, _ = _bfs_farthest(component, seed)
    b, parents = _bfs_farthest(component, a)
    path = [b]
    while path[-1] != a:
        path.append(parents[path[-1]])
    return path


class InteractiveScribblesRobot:
    """Simulates corrective scribbles on the worst-scored frame."""

    def __init__(self, params: RobotParams = RobotParams()):
        self.params = params

    def worst_frame(self, pred: np.ndarray, gt: np.ndarray,
                    num_objects: int,
                    exclude: Optional[List[int]] = None) -> int:
        """Frame with lowest J&F; previously annotated frames excluded
        unless everything has been annotated."""
        scores = jf_per_frame(pred, gt, num_objects)
        order = np.argsort(scores, kind="stable")
        exclude = set(exclude or [])
        for idx in order:
            if int(idx) not in exclude:
                return int(idx)
        return int(order[0])

    def scribble_frame(self, pred_frame: np.ndarray, gt_frame: np.ndarray,
                       num_objects: int, frame_idx: int, num_frames: int,
                       sequence: str) -> Scribbles:
        """Scribbles over the largest error region of each object
        (object_id 0 = background corrections, as in davisinteractive)."""
        h, w = gt_frame.shape
        p = self.params
        lines = []
        # rank objects (incl. background 0) by error area, scribble the worst
        errors = []
        for obj in range(num_objects + 1):
            err = (gt_frame == obj) & (pred_frame != obj)
            area = np.count_nonzero(err)
            if area >= p.min_region_pixels:
                errors.append((area, obj, err))
        errors.sort(key=lambda t: -t[0])
        for _, obj, err in errors[:p.max_objects_per_round]:
            line = self._scribble_region(err, obj, (h, w))
            if line is not None:
                lines.append(line)
        frames = [[] for _ in range(num_frames)]
        frames[frame_idx] = lines
        return Scribbles(sequence=sequence, scribbles=frames)

    def _scribble_region(self, err: np.ndarray, obj: int,
                         shape: tuple[int, int]) -> Optional[dict]:
        p = self.params
        labels, n = ndimage.label(err, structure=np.ones((3, 3)))
        if n == 0:
            return None
        sizes = ndimage.sum_labels(err, labels, index=np.arange(1, n + 1))
        comp = labels == (1 + int(np.argmax(sizes)))
        # erode proportionally to region scale so the scribble stays inside
        radius = max(1, int(p.kernel_size * np.sqrt(comp.sum())))
        eroded = ndimage.binary_erosion(
            comp, structure=np.ones((2 * radius + 1,) * 2, bool))
        region = eroded if eroded.sum() >= p.min_path_nodes else comp
        if region.sum() < p.min_path_nodes:
            return None
        # keep the largest component after erosion
        labels2, n2 = ndimage.label(region, structure=np.ones((3, 3)))
        if n2 > 1:
            sizes2 = ndimage.sum_labels(
                region, labels2, index=np.arange(1, n2 + 1))
            region = labels2 == (1 + int(np.argmax(sizes2)))
        path = _diameter_path(region)
        if len(path) < p.min_path_nodes:
            return None
        path = path[::p.sample_every] + [path[-1]]
        h, w = shape
        norm = [[x / max(w - 1, 1), y / max(h - 1, 1)] for (y, x) in path]
        return {"path": norm, "object_id": int(obj),
                "start_time": 0.0, "end_time": 0.0}

    def interact(self, sequence: str, pred: np.ndarray, gt: np.ndarray,
                 num_objects: int,
                 annotated: Optional[List[int]] = None) -> Scribbles:
        """Full robot step: worst frame -> error scribbles (davisinteractive
        `InteractiveScribblesRobot.interact` capability)."""
        frame = self.worst_frame(pred, gt, num_objects, exclude=annotated)
        return self.scribble_frame(
            pred[frame], gt[frame], num_objects, frame, pred.shape[0],
            sequence)
