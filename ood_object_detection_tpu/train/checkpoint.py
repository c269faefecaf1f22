"""Orbax checkpointing with true resume (params + opt state + step).

The reference only saves model state_dicts on best-val (pretrain.py:296-298)
and cannot resume optimizer/step (SURVEY §5.4); here a checkpoint carries
the full train state, saved asynchronously so the device never stalls, and
restore is preemption-safe (orbax keeps the latest complete step).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, keep: int = 5,
             async_save: bool = True) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=async_save)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class CheckpointManager:
    """Thin orbax wrapper: save(step, state), restore(state_like) -> state."""

    def __init__(self, directory: str, keep: int = 5, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        self._mgr = _manager(directory, keep=keep, async_save=async_save)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_variables(path: str, variables: Any):
    """One-shot save of model variables (inference checkpoints)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables)
    ckptr.wait_until_finished()


def restore_variables(path: str, variables_like: Any) -> Any:
    """One-shot restore against a template pytree."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), variables_like)
