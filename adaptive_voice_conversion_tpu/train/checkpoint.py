"""Checkpoint / resume via orbax.

The reference saves a single overwritten ``.ckpt``/``.opt`` pair and cannot
resume mid-run deterministically (solver.py:39-42; ``iteration`` argument
ignored — SURVEY.md §2.3). Here a CheckpointManager keeps rolling step
checkpoints of {params, opt_state, step, data seed} so a killed run resumes
exactly (with the deterministic data cursor in data/loader.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any, extra: dict) -> None:
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
                extra=ocp.args.JsonSave(extra),
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(
        self, step: Optional[int], params_like: Any, opt_state_like: Any
    ) -> Tuple[Any, Any, dict]:
        step = self._mngr.latest_step() if step is None else step
        out = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
                extra=ocp.args.JsonRestore(),
            ),
        )
        return out["params"], out["opt_state"], out["extra"]

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
