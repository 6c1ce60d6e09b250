"""Parquet / JSON IO for local paths and gs:// (storage plane).

The reference talks to GCS through pyarrow's GcsFileSystem and gcsfs
(`data_loader.py:47-68`, `preprocess_to_gcs.py:21-69`); the same storage
plane is kept here — GCS stays the data/checkpoint plane for TPU VMs, only
the compute moved on-device.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, List

import pyarrow.dataset as ds
import pyarrow.fs as pafs


def is_gcs(path: str) -> bool:
    return path.startswith("gs://")


def strip_scheme(path: str) -> str:
    return path.replace("gs://", "", 1) if is_gcs(path) else path


def filesystem_for(paths: Iterable[str] | str) -> pafs.FileSystem:
    if isinstance(paths, str):
        paths = [paths]
    if any(is_gcs(p) for p in paths):
        return pafs.GcsFileSystem()
    return pafs.LocalFileSystem()


def coerce_paths(paths) -> List[str]:
    return [paths] if isinstance(paths, str) else list(paths)


def open_dataset(paths: Iterable[str] | str) -> ds.Dataset:
    paths = coerce_paths(paths)
    if not paths:
        raise ValueError("paths must contain at least one parquet file.")
    return ds.dataset(
        [strip_scheme(p) for p in paths],
        format="parquet",
        filesystem=filesystem_for(paths),
    )


def ensure_local_parent(path: str) -> None:
    if not is_gcs(path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)


def write_json(path: str, payload: dict) -> None:
    content = json.dumps(payload, indent=2).encode("utf-8")
    if is_gcs(path):
        fs = pafs.GcsFileSystem()
        with fs.open_output_stream(strip_scheme(path)) as stream:
            stream.write(content)
        return
    ensure_local_parent(path)
    Path(path).write_bytes(content)


def read_json(path: str) -> dict:
    if is_gcs(path):
        fs = pafs.GcsFileSystem()
        with fs.open_input_stream(strip_scheme(path)) as stream:
            return json.loads(stream.read().decode("utf-8"))
    return json.loads(Path(path).read_text())
