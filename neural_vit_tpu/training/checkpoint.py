"""Checkpointing via Orbax, with save-best + final + restore.

The reference only ever *saves* (`train.py:265-275,290-305`; no load path
exists anywhere — SURVEY §5). Rebuilt on Orbax we get atomic async-safe
checkpoints to local or gs:// paths plus a restore path for
resume-from-preemption and offline evaluation.

Checkpoint layout per run: `<dir>/<name>/` holds the param pytree (Orbax
StandardCheckpointer) and `<dir>/<name>_config.json` the model config — the
same {weights, config} pairing the reference pickles into `.pt` files.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from neural_vit_tpu.core.config import Temporal3DViTConfig
from neural_vit_tpu.data.parquet_io import read_json, write_json


def _abs(path: str) -> str:
    if path.startswith("gs://"):
        return path
    return os.path.abspath(path)


# One process-wide async checkpointer for non-blocking saves: save()
# returns once the state is snapshotted to host memory; serialization and
# the (possibly gs://) writes continue on a background thread, so epoch
# N+1 computes while epoch N's "latest" checkpoint is still committing.
_ASYNC_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _async_checkpointer() -> ocp.StandardCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every pending async save has committed. Call before
    process exit — a preemption grace window must not race the writer
    thread, and an uncommitted Orbax save is discarded (tmp dir), not
    corrupted."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    directory: str,
    name: str,
    params,
    model_config: Temporal3DViTConfig,
    extra: Optional[dict] = None,
) -> str:
    """Save {params, config[, extra]} under `<directory>/<name>`."""
    path = f"{_abs(directory).rstrip('/')}/{name}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params), force=True)
    payload = dataclasses.asdict(model_config)
    if extra:
        payload["_extra"] = extra
    write_json(f"{path}_config.json", payload)
    return path


def restore_checkpoint(
    directory: str,
    name: str,
    abstract_params=None,
) -> Tuple[dict, Temporal3DViTConfig, dict]:
    """Restore (params, model_config, extra) from `<directory>/<name>`."""
    path = f"{_abs(directory).rstrip('/')}/{name}"
    payload = read_json(f"{path}_config.json")
    extra = payload.pop("_extra", {})
    # Full-state checkpoints (save_train_checkpoint) store
    # {params, opt_state, step}; slice out the params subtree so offline
    # eval / serving export can consume a "latest" checkpoint too.
    is_full_state = "_loop" in payload
    payload.pop("_loop", None)
    config = Temporal3DViTConfig(**payload)
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_params is not None and not is_full_state:
            params = ckptr.restore(path, abstract_params)
        else:
            params = ckptr.restore(path)
    if is_full_state:
        params = params["params"]
    return params, config, extra


# ---- full training-state checkpoints (resume-from-preemption) -------------
#
# The best/final checkpoints above carry {params, config} — the reference's
# payload (`train.py:265-275`) and what offline eval needs. Preemption
# resume needs more: optimizer moments, the step counter (drives the LR
# schedule and the per-step dropout fold_in), and the loop bookkeeping
# (epoch, best metrics, patience, seed). `save_train_checkpoint` stores the
# whole thing; `is_train_checkpoint` lets the loop distinguish a full-state
# checkpoint (exact resume) from a params-only one (warm start).


def _state_tree(state):
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    # EMA shadow params travel with the full state when enabled, so an
    # exact resume continues the same average. Save and resume configs
    # must agree on ema_decay>0 (the restore target is built from the
    # fresh state, and Orbax requires matching tree structure).
    ema = getattr(state, "ema_params", None)
    if ema is not None:
        tree["ema_params"] = ema
    return tree


def save_train_checkpoint(
    directory: str,
    name: str,
    state,
    model_config: Temporal3DViTConfig,
    loop_state: dict,
    block: bool = True,
) -> str:
    """Save the full TrainState + loop bookkeeping under `<directory>/<name>`.

    block=False returns as soon as the state is snapshotted to host; the
    write commits on a background thread (Orbax writes to a tmp dir and
    renames, so the previous checkpoint at `name` stays restorable until
    the new one is complete). Call `wait_for_saves()` before process exit.
    """
    path = f"{_abs(directory).rstrip('/')}/{name}"
    tree = jax.device_get(_state_tree(state))
    # Drain any in-flight async save first — two writers on the same
    # checkpoint name (e.g. a blocking preemption save racing the previous
    # epoch's async "latest") must never overlap.
    wait_for_saves()
    if block:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, tree, force=True)
    else:
        _async_checkpointer().save(path, tree, force=True)
    payload = dataclasses.asdict(model_config)
    payload["_loop"] = loop_state
    write_json(f"{path}_config.json", payload)
    return path


def is_train_checkpoint(path: str) -> bool:
    """True if `<path>` was written by save_train_checkpoint."""
    try:
        return "_loop" in read_json(f"{_abs(path)}_config.json")
    except Exception:
        return False


def restore_train_checkpoint(
    directory: str,
    name: str,
    abstract_state,
) -> Tuple[dict, Temporal3DViTConfig, dict]:
    """Restore ({params, opt_state, step}, model_config, loop_state)."""
    path = f"{_abs(directory).rstrip('/')}/{name}"
    payload = read_json(f"{path}_config.json")
    loop_state = payload.pop("_loop")
    payload.pop("_extra", None)
    config = Temporal3DViTConfig(**payload)
    abstract = jax.eval_shape(lambda: _state_tree(abstract_state))
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, abstract)
    return tree, config, loop_state
