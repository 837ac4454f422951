"""Shim for `davisinteractive.storage`: interaction-result stores.

Upstream's evaluation service persists per-interaction scores through a
storage backend — `LocalStorage` (in-memory pandas, local sessions) or a
DB-backed store on the hosted server. Our framework's session/service
keep their own row lists internally (interactive/session.py
REPORT_COLUMNS); this module exposes the upstream storage API for user
code that instantiates a storage directly.

Validation semantics pinned from the upstream contract: per
(session, sequence, scribble_idx) interactions must arrive in order
starting at 1, result vectors must be equally sized, and metric values
must lie in [0, 1]. A/B against the real package when installable.
"""

import abc
from typing import List, Optional

import numpy as np
import pandas as pd

__all__ = ["AbstractStorage", "LocalStorage"]


class AbstractStorage(abc.ABC):
    COLUMNS = ["session_id", "sequence", "scribble_idx", "interaction",
               "object_id", "frame", "jaccard", "contour", "timing"]

    @abc.abstractmethod
    def store_interactions_results(self, user_id, session_id, sequence,
                                   scribble_idx, interaction, timing,
                                   objects_idx, frames_idx, jaccard,
                                   contour):
        """Store one interaction's per-(object, frame) J and F scores."""

    @abc.abstractmethod
    def get_report(self, session_id: Optional[str] = None) -> pd.DataFrame:
        """All stored rows (optionally one session's) as a DataFrame."""


class LocalStorage(AbstractStorage):
    """In-memory store for locally evaluated sessions."""

    def __init__(self):
        self._rows: List[list] = []

    def store_interactions_results(self, user_id, session_id, sequence,
                                   scribble_idx, interaction, timing,
                                   objects_idx, frames_idx, jaccard,
                                   contour):
        del user_id  # single-user local store
        jaccard = np.asarray(jaccard, dtype=float).ravel()
        contour = np.asarray(contour, dtype=float).ravel()
        objects_idx = np.asarray(objects_idx, dtype=int).ravel()
        frames_idx = np.asarray(frames_idx, dtype=int).ravel()
        if not (len(jaccard) == len(contour) == len(objects_idx)
                == len(frames_idx)):
            raise ValueError("objects_idx, frames_idx, jaccard and contour "
                             "must all have the same length")
        for name, v in (("jaccard", jaccard), ("contour", contour)):
            # NaN fails this check too (comparisons with NaN are False)
            if v.size and not np.all((v >= 0.0) & (v <= 1.0)):
                raise ValueError(f"{name} values must be in [0, 1]")
        key = (session_id, sequence, int(scribble_idx))
        prev = max((r[3] for r in self._rows
                    if (r[0], r[1], r[2]) == key), default=0)
        if int(interaction) != prev + 1:
            raise ValueError(
                f"interaction {interaction} out of order for {key}: "
                f"expected {prev + 1}")
        for o, f, j, c in zip(objects_idx, frames_idx, jaccard, contour):
            self._rows.append([session_id, sequence, int(scribble_idx),
                               int(interaction), int(o), int(f),
                               float(j), float(c), float(timing)])
        return True

    def get_report(self, session_id: Optional[str] = None) -> pd.DataFrame:
        rows = self._rows if session_id is None else [
            r for r in self._rows if r[0] == session_id]
        return pd.DataFrame(rows, columns=self.COLUMNS)

    def get_annotated_frames(self, session_id, sequence,
                             scribble_idx) -> List[int]:
        """Frames already scored for this item (robot exclusion list)."""
        key = (session_id, sequence, int(scribble_idx))
        return sorted({r[5] for r in self._rows
                       if (r[0], r[1], r[2]) == key})
