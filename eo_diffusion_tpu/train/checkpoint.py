"""Orbax checkpointing: save/restore {params, ema_params, opt_state, step}.

Superset of the reference's ``torch.save({"model","model_ema"})``
(train.py:137-138): optimizer state and step counter are persisted too, so
resume continues the LR schedule and Adam moments exactly (the reference
loses both -- SURVEY.md §5 "checkpoint/resume"). Sharding-aware restore:
arrays come back with the shardings of the template state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "best_dir"]

_STEP_PREFIX = "steps_"


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, step: Optional[int] = None,
                    name: Optional[str] = None) -> str:
    """Save a TrainState pytree under ``ckpt_dir/steps_<step>`` (or ``name``)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    sub = name if name is not None else f"{_STEP_PREFIX}{step:08d}"
    path = os.path.join(ckpt_dir, sub)
    ckptr = _ckptr()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d[len(_STEP_PREFIX):])
        for d in os.listdir(ckpt_dir)
        if d.startswith(_STEP_PREFIX) and d[len(_STEP_PREFIX):].isdigit()
    ]
    return max(steps) if steps else None


def best_dir(ckpt_dir: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), "best")


def restore_params(path: str, params_template: Any) -> tuple:
    """Restore only (params, ema_params) from a TrainState checkpoint.

    Inference doesn't know (or need) the optimizer-state structure; orbax
    partial restore skips it.
    """
    path = os.path.abspath(path)
    # structure-free restore (numpy arrays), then select the two subtrees;
    # avoids needing the training-time optimizer-state structure here
    restored = _ckptr().restore(path)
    return restored["params"], restored["ema_params"]


class CheckpointManager:
    """Orbax CheckpointManager wrapper: periodic saves with retention.

    Keeps at most ``max_to_keep`` step checkpoints (plus everything saved via
    :func:`save_checkpoint`'s named saves like "best"), saving asynchronously
    so training doesn't stall on I/O -- the production upgrade over the
    reference's unbounded ``torch.save`` spray (train.py:133-155).
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, template: Any) -> Any:
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x,
            template,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` supplies structure/shapes/shardings (typically a freshly
    initialized TrainState).
    """
    path = os.path.abspath(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        template,
    )
    return _ckptr().restore(path, abstract)
