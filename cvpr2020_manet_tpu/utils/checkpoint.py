"""Checkpoint save/load/resume via orbax (SURVEY.md §6 checkpoint row).

The reference torch.saves a state_dict every N steps and resumes by
loading snapshot + step counter (ref:train_stage*.py, expected). Same
capability here with orbax: versioned step checkpoints with retention,
plus an immutable "release" export of params-only (the analog of the
published MANet checkpoint, SURVEY.md C21).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from cvpr2020_manet_tpu.engine.train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into an existing (template) TrainState."""
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoint in {self._dir}"
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
        payload = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return state.replace(params=payload["params"],
                             opt_state=payload["opt_state"],
                             step=payload["step"])


def export_release(params: Any, directory: str) -> None:
    """Immutable params-only export (the 'released checkpoint')."""
    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_release(template_params: Any, directory: str) -> Any:
    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template_params)
