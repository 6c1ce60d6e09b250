"""Device mesh + sharding rules: DP first-class, TP-ready.

The reference is single-process / single-GPU with no collectives
(SURVEY §2.2); parallelism here is expressed the TPU way — a
`jax.sharding.Mesh` with ('data', 'model') axes and `NamedSharding`
annotations on batches and parameters. XLA inserts the gradient
all-reduce (DP) and the qkv/proj/fc1/fc2 collectives (TP) over ICI from the
shardings alone; there is no hand-written communication.

  * data axis: batch dimension of inputs; gradients all-reduce implicitly.
  * model axis: attention heads and the MLP hidden dimension — the classic
    Megatron-style pairing (qkv/fc1 column-split, proj/fc2 row-split) that
    needs only one all-reduce per block per direction. At the reference's
    ≤27 M-param scale TP is not *needed* (SURVEY §2.2), but the rules make
    the same train step run tp>1 unchanged, which the multi-chip dry-run
    exercises.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Static mesh description: data × model axes.

    `device_indices` restricts the mesh to a subset of `jax.devices()` — the
    mechanism behind mesh-slice HP sweeps, where each trial owns a disjoint
    slice of the chip pool and trials never communicate.
    """

    data: int = -1   # -1: all remaining devices
    model: int = 1
    device_indices: Optional[tuple] = None

    def resolve(self, n_devices: Optional[int] = None) -> tuple[int, int]:
        if n_devices is None:
            n_devices = (
                len(self.device_indices) if self.device_indices is not None
                else len(jax.devices())
            )
        n = n_devices
        model = max(1, self.model)
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = self.data if self.data > 0 else n // model
        if data * model != n:
            raise ValueError(
                f"mesh {data}×{model} != {n} available devices"
            )
        return data, model


def make_mesh(spec: MeshSpec = MeshSpec(), devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if spec.device_indices is not None:
            devices = [devices[i] for i in spec.device_indices]
    devices = np.asarray(devices)
    data, model = spec.resolve(len(devices))
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch dim over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style TP rules keyed on flattened param path.
# Dense kernels are (in, out) in flax. The qkv projection is a DenseGeneral
# with a (D, 3, D) kernel (byte-identical to Dense(3D)) so the column split
# lands on the head-major LAST dim: every model-shard gets whole head
# groups of q, k, AND v — the contiguous per-shard [q|k|v] packing the
# flash kernel consumes under shard_map (ops/attention.py
# tp_multi_head_attention_qkv3).
_TP_RULES = (
    (re.compile(r"attn/qkv/kernel$"), P(None, None, "model")),  # column
    (re.compile(r"attn/qkv/bias$"), P(None, "model")),
    (re.compile(r"attn/proj/kernel$"), P("model", None)),    # row
    (re.compile(r"mlp/fc1/kernel$"), P(None, "model")),      # column
    (re.compile(r"mlp/fc1/bias$"), P("model")),
    (re.compile(r"mlp/fc2/kernel$"), P("model", None)),      # row
)


def _spec_for_path(path: str, shape: tuple, mesh: Mesh) -> P:
    if mesh.shape["model"] > 1:
        for pattern, spec in _TP_RULES:
            if pattern.search(path):
                # Only shard if the dimension divides evenly.
                dims = tuple(
                    mesh.shape[ax] if isinstance(ax, str) else 1
                    for ax in spec
                )
                ok = all(
                    s % d == 0 for s, d in zip(shape, dims) if d > 1
                )
                if ok:
                    return spec
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param tree: TP rules on matching paths,
    replicated otherwise."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        """kp entries → '/'-joined names. Every jax key type is covered
        explicitly (DictKey.key, SequenceKey.idx, GetAttrKey.name,
        FlattenedIndexKey.key); anything else falls back to str(entry)."""
        parts = []
        for e in kp:
            for attr in ("key", "idx", "name"):
                v = getattr(e, attr, None)
                if v is not None:
                    parts.append(str(v))
                    break
            else:
                parts.append(str(e))
        return "/".join(parts)

    specs = {}
    for kp, leaf in flat:
        specs[jax.tree_util.keystr(kp)] = NamedSharding(
            mesh, _spec_for_path(path_str(kp), np.shape(leaf), mesh)
        )

    def lookup(kp, leaf):
        return specs[jax.tree_util.keystr(kp)]

    return jax.tree_util.tree_map_with_path(lookup, params)
