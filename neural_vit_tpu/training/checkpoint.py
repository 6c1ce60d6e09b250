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
    try:
        payload = read_json(f"{path}_config.json")
    except Exception:
        # Full-state checkpoints live in alternating slot dirs
        # (`<name>.0`/`<name>.1`) — resolve the newest complete one so
        # offline eval / serving export can consume a "latest" too.
        resolved = resolve_train_checkpoint(path)
        if resolved is None:
            raise
        path, payload = resolved[0], dict(resolved[1])
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
#
# Crash safety: Orbax's `force=True` deletes the existing directory at
# `save()` start (synchronously, even for async saves) — so repeatedly
# saving to ONE name means a hard kill mid-commit (OOM, power loss, a
# preemption without SIGTERM grace) loses the previous checkpoint too.
# Full-state saves therefore ALTERNATE between two slot directories
# (`<name>.0` / `<name>.1`): the newer slot is written while the older one
# stays intact, so at least one complete checkpoint always exists. Restore
# resolves `<name>` to the newest slot that (a) committed (Orbax's final
# directory is created by atomic rename locally / carries
# commit_success.txt on GCS) and (b) whose sidecar matches the saved tree
# (global_step cross-check — the sidecar and the tree are separate writes).


def _slot_candidates(path: str):
    """Slot paths for a logical full-state checkpoint name, plus the bare
    path for checkpoints written before slotting existed."""
    return (f"{path}.0", f"{path}.1", path)


def _is_committed(path: str) -> bool:
    """True if an Orbax checkpoint directory at `path` finished committing."""
    from etils import epath

    p = epath.Path(path)
    if not p.exists():
        return False
    if path.startswith("gs://"):
        # GCS has no atomic rename; Orbax marks completion with a file.
        return (p / "commit_success.txt").exists()
    return True


def _read_slot(path: str):
    """(sidecar payload, save_seq) if `path` holds a complete full-state
    checkpoint, else None."""
    try:
        payload = read_json(f"{path}_config.json")
    except Exception:
        return None
    if "_loop" not in payload or not _is_committed(path):
        return None
    seq = payload["_loop"].get("save_seq", [0, 0.0])
    return payload, tuple(seq)


def resolve_train_checkpoint(path: str):
    """Newest complete slot for logical checkpoint `path`, or None."""
    best = None
    for cand in _slot_candidates(_abs(path)):
        info = _read_slot(cand)
        if info is not None and (best is None or info[1] > best[2]):
            best = (cand, info[0], info[1])
    return best


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
    write commits on a background thread. Successive saves alternate
    between `<name>.0` and `<name>.1` so the previous checkpoint stays
    restorable even through a hard kill mid-commit (see module notes).
    Call `wait_for_saves()` before process exit.
    """
    import time as _time

    path = f"{_abs(directory).rstrip('/')}/{name}"
    tree = jax.device_get(_state_tree(state))
    # Drain any in-flight async save first — two writers on the same
    # checkpoint name (e.g. a blocking preemption save racing the previous
    # epoch's async "latest") must never overlap.
    wait_for_saves()
    # Pick the slot NOT holding the newest complete checkpoint.
    current = resolve_train_checkpoint(path)
    slot = f"{path}.1" if (current and current[0] == f"{path}.0") else f"{path}.0"
    step = int(tree["step"])
    loop_state = dict(
        loop_state,
        # Ordering key for slot resolution + sidecar↔tree pairing check.
        save_seq=[step, _time.time()],
        global_step=step,
        # Structural marker: restore validates this against the resume
        # config BEFORE attempting the Orbax restore, so an ema_decay
        # toggle between save and resume fails with a clear error instead
        # of an opaque tree-structure mismatch (or a silent fall-through
        # to an older compatible slot).
        has_ema="ema_params" in tree,
    )
    if block:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(slot, tree, force=True)
    else:
        _async_checkpointer().save(slot, tree, force=True)
    payload = dataclasses.asdict(model_config)
    payload["_loop"] = loop_state
    write_json(f"{slot}_config.json", payload)
    return path


def is_train_checkpoint(path: str) -> bool:
    """True if `<path>` holds a complete full-state checkpoint (any slot)."""
    return resolve_train_checkpoint(path) is not None


def restore_train_checkpoint(
    directory: str,
    name: str,
    abstract_state,
) -> Tuple[dict, Temporal3DViTConfig, dict]:
    """Restore ({params, opt_state, step}, model_config, loop_state) from the
    newest complete slot of `<directory>/<name>`. Slots whose sidecar and
    tree disagree (a crash landed between the two writes) are skipped in
    favor of the older complete one."""
    path = f"{_abs(directory).rstrip('/')}/{name}"
    abstract = jax.eval_shape(lambda: _state_tree(abstract_state))
    want_ema = "ema_params" in abstract
    candidates = []
    for cand in _slot_candidates(path):
        info = _read_slot(cand)
        if info is not None:
            candidates.append((info[1], cand, info[0]))
    candidates.sort(reverse=True)
    last_err: Optional[Exception] = None
    for _seq, slot, payload in candidates:
        payload = dict(payload)
        loop_state = payload.pop("_loop")
        payload.pop("_extra", None)
        config = Temporal3DViTConfig(**payload)
        # Structural pre-check: an ema_decay toggle between save and resume
        # is a config error affecting EVERY slot — fail fast with the cause
        # instead of surfacing Orbax's tree-structure error (or silently
        # resuming from a much older pre-toggle checkpoint).
        has_ema = loop_state.get("has_ema")
        if has_ema is not None and bool(has_ema) != want_ema:
            raise ValueError(
                f"Checkpoint {slot} was saved with ema_decay "
                f"{'> 0' if has_ema else '== 0'} but the resume config has "
                f"ema_decay {'> 0' if want_ema else '== 0'} — set "
                "TrainConfig.ema_decay to match the saved run (the EMA "
                "shadow is part of the full train state)."
            )
        try:
            with ocp.StandardCheckpointer() as ckptr:
                tree = ckptr.restore(slot, abstract)
        except Exception as exc:  # partially-committed slot — try the next
            last_err = exc
            print(f"WARNING: skipping committed checkpoint slot {slot} — "
                  f"restore failed ({type(exc).__name__}: {exc}); falling "
                  "back to an older slot if one exists")
            continue
        expect = loop_state.get("global_step")
        if expect is not None and int(tree["step"]) != int(expect):
            print(f"WARNING: skipping checkpoint slot {slot} — sidecar "
                  f"global_step {expect} does not match the saved tree's "
                  f"step {int(tree['step'])} (crash between the two writes)")
            continue  # sidecar belongs to a different (lost) save
        return tree, config, loop_state
    raise FileNotFoundError(
        f"No complete full-state checkpoint at {path}"
        + (f" (last error: {last_err})" if last_err else "")
    )
