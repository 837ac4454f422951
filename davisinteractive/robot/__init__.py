"""`davisinteractive.robot` — scribble-simulation robot in the upstream
calling convention (upstream: davisinteractive/robot/interactive_robot.py;
SURVEY.md C20).

Upstream constructor knobs map onto the framework's `RobotParams`:
`kernel_size` → erosion kernel (relative), `max_kernel_radius` → pixel
cap on the derived erosion radius, `min_nb_nodes` → minimum polyline
nodes, `nb_points` → upper bound on emitted polyline nodes. All four are
honored by both the native (C++) and numpy skeleton pipelines.
"""

import dataclasses
from typing import List, Optional

import numpy as np

from cvpr2020_manet_tpu.interactive.robot import (
    InteractiveScribblesRobot as _Robot, RobotParams)

__all__ = ["InteractiveScribblesRobot"]


class InteractiveScribblesRobot(_Robot):
    """Upstream-signature wrapper: `interact` takes `(sequence,
    pred_masks, gt_masks, nb_objects=None, frame=None)` and returns the
    scribble payload as a JSON dict (the framework class returns a typed
    `Scribbles`)."""

    def __init__(self, kernel_size: float = 0.15,
                 max_kernel_radius: int = 16,
                 min_nb_nodes: int = 4,
                 nb_points: int = 1000):
        super().__init__(dataclasses.replace(
            RobotParams(), kernel_size=kernel_size,
            max_kernel_radius=float(max_kernel_radius),
            min_path_nodes=min_nb_nodes,
            max_path_points=nb_points))

    def interact(self, sequence: str, pred_masks: np.ndarray,
                 gt_masks: np.ndarray, nb_objects: Optional[int] = None,
                 frame: Optional[int] = None,
                 annotated: Optional[List[int]] = None) -> dict:
        pred_masks = np.asarray(pred_masks)
        gt_masks = np.asarray(gt_masks)
        if nb_objects is None:
            n = int(np.max(gt_masks)) if gt_masks.size else 0
            nb_objects = max(n, 1)
        if frame is None:
            scr = super().interact(sequence, pred_masks, gt_masks,
                                   nb_objects, annotated=annotated)
        else:
            scr = self.scribble_frame(
                pred_masks[frame], gt_masks[frame], nb_objects, frame,
                pred_masks.shape[0], sequence)
        return scr.to_json()
