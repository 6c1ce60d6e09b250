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
    config = Temporal3DViTConfig(**payload)
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_params is not None:
            params = ckptr.restore(path, abstract_params)
        else:
            params = ckptr.restore(path)
    return params, config, extra
