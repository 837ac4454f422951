"""Interactive benchmark session — local-service equivalent of
`davisinteractive.session.DavisInteractiveSession` (SURVEY.md C20, L6).

Protocol (HIGH confidence, SURVEY.md §1):
  for each sequence × scribble set:
    round 0: hand-drawn initial scribbles       -> model -> masks
    rounds 1..R-1: robot scribbles on the worst frame of the previous
    submission -> model -> masks
  every submission is scored (per-frame, per-object J and boundary F) and
  timestamped; the report yields the time-vs-quality curve -> AUC and
  J&F@60s.

API mirrors the external package: context manager, `next()`,
`get_scribbles(only_last=...)`, `submit_masks(...)`, `get_report()`,
`get_global_summary()`.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

from cvpr2020_manet_tpu.interactive.metrics import batched_f_measure
from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
from cvpr2020_manet_tpu.interactive.scribbles import (
    Scribbles, annotated_frames)

REPORT_COLUMNS = [
    "sequence", "scribble_idx", "interaction", "object_id", "frame",
    "jaccard", "contour", "timing",
]


class InteractiveSession:
    def __init__(self, dataset, *, max_interactions: int = 8,
                 max_time: Optional[float] = None,
                 metric_to_optimize: str = "J_AND_F",
                 robot: Optional[InteractiveScribblesRobot] = None,
                 time_fn=time.perf_counter,
                 skip_items=None, seed_rows=None, on_item_end=None):
        """skip_items/seed_rows/on_item_end support RESUMING an
        interrupted run: skip_items is a set of completed
        (sequence, scribble_idx) pairs dropped from the work queue,
        seed_rows re-seeds their report rows (so the final summary spans
        the whole dataset), and on_item_end(sequence, scribble_idx)
        fires exactly once when an item finishes — the hook callers use
        to checkpoint the report incrementally (engine/eval_davis.py
        --resume)."""
        self.dataset = dataset
        self.max_interactions = max_interactions
        # davisinteractive semantics: per-(sequence x scribble-set) time
        # budget in seconds, scaled by the sequence's object count; the
        # item stops when EITHER budget is exhausted. Timing includes the
        # scribble-robot time (it is part of the service wall clock).
        self.max_time = max_time
        self.metric = metric_to_optimize
        self.robot = robot or InteractiveScribblesRobot()
        self._time = time_fn
        self.on_item_end = on_item_end
        # (sequence, scribble_set) work queue
        skip = skip_items or set()
        self._queue = [(s, i) for s in dataset.sequences()
                       for i in range(dataset.num_scribble_sets(s))
                       if (s, i) not in skip]
        self._seed_rows = list(seed_rows) if seed_rows is not None else []
        self._pos = -1
        self._interaction = 0          # rounds done for current item
        self._scribbles: Optional[Scribbles] = None   # accumulated
        self._last_scribbles: Optional[Scribbles] = None
        self._annotated: list[int] = []
        self._rows: list[dict] = []
        self._t_handout = 0.0
        self._elapsed = 0.0            # accumulated model time, current item
        self._awaiting_submit = False

    # -- context manager -------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    # -- protocol ---------------------------------------------------------
    def next(self) -> bool:
        """Advance to the next interaction. False when the session is done."""
        if self._awaiting_submit:
            raise RuntimeError("submit_masks() before calling next() again")
        if self._pos < 0 or self._interaction >= self.max_interactions:
            if self._pos >= 0 and self.on_item_end is not None:
                # the item at _pos just finished (all rounds done or
                # stopped early) — fires exactly once per item, including
                # the last one on the final next() that returns False
                self.on_item_end(*self._queue[self._pos])
            self._pos += 1
            if self._pos >= len(self._queue):
                return False
            seq, set_idx = self._queue[self._pos]
            self._interaction = 0
            self._elapsed = 0.0
            self._annotated = []
            init = self.dataset.initial_scribbles(seq, set_idx)
            self._scribbles = init
            self._last_scribbles = init
        self._awaiting_submit = True
        self._t_handout = self._time()
        return True

    @property
    def current(self):
        return self._queue[self._pos]

    @property
    def finished(self) -> bool:
        """True once next() has exhausted the work queue (the report
        stays queryable; the session will never accept more masks)."""
        return self._pos >= len(self._queue)

    def get_scribbles(self, only_last: bool = False):
        """-> (sequence, scribbles_json, first_scribble)."""
        seq, _ = self.current
        scr = self._last_scribbles if only_last else self._scribbles
        return seq, scr.to_json(), self._interaction == 0

    def submit_masks(self, masks: np.ndarray) -> None:
        """Score a full-video label map (T, H, W) and prepare next round."""
        if not self._awaiting_submit:
            raise RuntimeError("call next() before submit_masks()")
        dt = self._time() - self._t_handout
        self._elapsed += dt
        seq, set_idx = self.current
        gt = self.dataset.gt_masks(seq)
        n_obj = self.dataset.num_objects(seq)
        masks = np.asarray(masks)
        assert masks.shape == gt.shape, (masks.shape, gt.shape)

        self._annotated.extend(annotated_frames(self._last_scribbles))
        for obj in range(1, n_obj + 1):
            jj = np.array([_iou(masks[t] == obj, gt[t] == obj)
                           for t in range(gt.shape[0])])
            ff = batched_f_measure(
                np.where(masks == obj, 1, 0), np.where(gt == obj, 1, 0), 1)
            for t in range(gt.shape[0]):
                self._rows.append(dict(
                    sequence=seq, scribble_idx=set_idx,
                    interaction=self._interaction, object_id=obj, frame=t,
                    jaccard=float(jj[t]), contour=float(ff[t]),
                    timing=self._elapsed))

        self._interaction += 1
        self._awaiting_submit = False
        if (self.max_time is not None
                and self._elapsed >= self.max_time * max(n_obj, 1)):
            # time budget for this item exhausted (davisinteractive stops
            # on max_time OR max_nb_interactions, whichever first)
            self._interaction = self.max_interactions
        if self._interaction < self.max_interactions:
            t_robot = self._time()
            new = self.robot.interact(
                seq, masks, gt, n_obj, annotated=self._annotated)
            # robot time is service time: it lands in the NEXT round's
            # cumulative timestamp, as in the upstream local service
            self._elapsed += self._time() - t_robot
            if not annotated_frames(new):
                # prediction is (near-)perfect: the robot has nothing to
                # correct — end this item early
                self._interaction = self.max_interactions
            else:
                self._last_scribbles = new
                self._scribbles = self._scribbles.merge(new)

    # -- reporting ----------------------------------------------------------
    def get_report(self) -> pd.DataFrame:
        return pd.DataFrame(self._seed_rows + self._rows,
                            columns=REPORT_COLUMNS)

    def get_global_summary(
        self, max_time: float = 240.0, at_threshold: float = 60.0
    ) -> Dict[str, Any]:
        """Time-vs-quality curve -> AUC (normalized) and J&F@threshold.

        Follows the davisinteractive summary semantics: for each
        (sequence, scribble set), quality at time t is the J&F of the last
        interaction whose cumulative model time is <= t (0 before the
        first); curves are averaged across items, AUC is the normalized
        integral over [0, max_time].
        """
        df = self.get_report()
        if df.empty:
            return {"auc": 0.0, "metric_at_threshold": 0.0, "curve": None}
        df = df.assign(jf=0.5 * (df["jaccard"] + df["contour"]))
        per_round = (df.groupby(["sequence", "scribble_idx", "interaction"])
                     .agg(jf=("jf", "mean"), timing=("timing", "max"))
                     .reset_index())
        grid = np.linspace(0.0, max_time, 481)
        curves = []
        for _, item in per_round.groupby(["sequence", "scribble_idx"]):
            item = item.sort_values("interaction")
            q = np.zeros_like(grid)
            for _, row in item.iterrows():
                q[grid >= row.timing] = row.jf
            curves.append(q)
        mean_curve = np.mean(curves, axis=0)
        auc = float(np.trapezoid(mean_curve, grid) / max_time)
        at = float(np.interp(at_threshold, grid, mean_curve))
        return {"auc": auc, "metric_at_threshold": at,
                "curve": (grid, mean_curve)}


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    union = np.count_nonzero(a | b)
    if union == 0:
        return 1.0
    return float(np.count_nonzero(a & b) / union)


class DavisInteractiveSession(InteractiveSession):
    """Drop-in constructor parity with
    `davisinteractive.session.DavisInteractiveSession` (SURVEY.md C20):

        with DavisInteractiveSession(host='localhost',
                                     davis_root='/data/DAVIS',
                                     subset='val',
                                     max_nb_interactions=8,
                                     max_time=None) as sess:
            while sess.next(): ...

    As upstream, `host` selects the mode: `'localhost'` (or any non-URL)
    runs the in-process local service; an `http(s)://` URL returns a
    `RemoteSession` speaking to an `interactive.service` evaluation
    server (the server owns dataset, ground truth, robot, and the
    clock — `key`/`davis_root`/`subset` are server-side there). Pass
    `dataset=` to skip the DAVIS tree and use any adapter (e.g. the
    synthetic fixture)."""

    def __new__(cls, host: str = "localhost", key: str = "",
                davis_root: Optional[str] = None, subset: str = "val",
                max_nb_interactions: int = 8,
                max_time: Optional[float] = None,
                metric_to_optimize: str = "J_AND_F",
                dataset=None, save_report_dir: Optional[str] = None,
                **kwargs):
        del save_report_dir  # consumed by __init__ (local mode only)
        if isinstance(host, str) and host.startswith(("http://", "https://")):
            from cvpr2020_manet_tpu.interactive.service import RemoteSession
            if dataset is None and davis_root is not None:
                # client-local frames (the model side owns the video; the
                # server owns ground truth + scoring)
                from cvpr2020_manet_tpu.data.davis import DavisEvalDataset
                dataset = DavisEvalDataset(davis_root, subset=subset)
            # not an instance of cls -> __init__ below is skipped
            return RemoteSession(
                host, max_nb_interactions=max_nb_interactions,
                max_time=max_time, metric_to_optimize=metric_to_optimize,
                images=dataset)
        return super().__new__(cls)

    def __init__(self, host: str = "localhost", key: str = "",
                 davis_root: Optional[str] = None, subset: str = "val",
                 max_nb_interactions: int = 8,
                 max_time: Optional[float] = None,
                 metric_to_optimize: str = "J_AND_F",
                 dataset=None, save_report_dir: Optional[str] = None,
                 **kwargs):
        del host, key
        if dataset is None:
            if davis_root is None:
                raise ValueError("pass davis_root=... or dataset=...")
            from cvpr2020_manet_tpu.data.davis import DavisEvalDataset
            dataset = DavisEvalDataset(davis_root, subset=subset)
        # upstream semantics: the session writes its report CSV into
        # save_report_dir when the protocol loop closes
        self._save_report_dir = save_report_dir
        super().__init__(dataset, max_interactions=max_nb_interactions,
                         max_time=max_time,
                         metric_to_optimize=metric_to_optimize, **kwargs)

    def __exit__(self, *exc):
        if self._save_report_dir is not None and exc[0] is None:
            import os
            os.makedirs(self._save_report_dir, exist_ok=True)
            self.get_report().to_csv(
                os.path.join(self._save_report_dir, "report.csv"),
                index=False)
        return super().__exit__(*exc)
