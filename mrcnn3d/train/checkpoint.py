"""Orbax checkpointing with the reference's interval/resume semantics.

Reference: mmcv CheckpointHook interval=5 epochs + `latest.pth` symlink,
runner.resume restoring model+optimizer+epoch (SURVEY.md section 5).
Here: orbax CheckpointManager keyed by step, saving the whole TrainState
(params + frozen batch_stats + opt_state + step).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from .step import TrainState


def make_manager(work_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.join(work_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True
    )
    return ocp.CheckpointManager(path, options=options)


def save(manager: ocp.CheckpointManager, state: TrainState, step: int):
    manager.save(
        step, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state._asdict()))
    )


def restore(
    manager: ocp.CheckpointManager, abstract_state: TrainState, step=None
) -> TrainState | None:
    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    restored = manager.restore(
        step,
        args=ocp.args.StandardRestore(abstract_state._asdict()),
    )
    return TrainState(**restored)


def restore_params(
    manager: ocp.CheckpointManager, step=None
) -> dict[str, Any] | None:
    """Params-only restore for evaluation/serving.

    Reads the raw checkpoint tree and returns
    {params, batch_stats, step} — no optimizer chain needs to be rebuilt,
    decoupling eval from the training schedule/optimizer configuration.
    """
    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    raw = manager.restore(step)
    return dict(
        params=raw["params"],
        batch_stats=raw.get("batch_stats") or {},
        step=int(raw.get("step", step)),
    )
