"""Checkpoint save/load (orbax) — the reference's save_model/load_model equivalent.

Parity target: src/lib/models/model.py:34-105 — checkpoints hold
{epoch, state_dict, optimizer}; `--resume` restores optimizer state and replays the
LR schedule (here the schedule is a pure function of `state.step`, so restoring the
step restores the LR); best/last/periodic naming follows main_CenterPose.py:90-110.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, state: Any, step: int, metadata: Optional[dict] = None):
    """Write a full TrainState at `step` under `directory`."""
    mgr = _manager(directory)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)} if metadata else {}
            ),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def load_checkpoint(directory: str, state_template: Any, step: Optional[int] = None):
    """Restore a TrainState; step=None loads the latest (the reference's
    `--resume` → model_last behavior, opts.py:43-47)."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    restored = mgr.restore(
        step, args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template))
    )
    mgr.close()
    return restored["state"], step


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
