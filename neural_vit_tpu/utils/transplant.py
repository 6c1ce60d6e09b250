"""Torch→JAX weight transplant for the Temporal 3D ViT.

Maps a reference `temporal_vit.models.model.Temporal3DViT` state_dict
(reference `models/model.py:181-323`) onto the flax param tree of
`neural_vit_tpu.models.vit.Temporal3DViT`. The two layouts were designed
to be interchangeable — the patch embed kernel is Conv3d-weight-ordered
(`models/vit.py:404-423`) and the fused qkv kernel packs [q | k | v]
columns exactly like torch's dim→3·dim Linear — so every tensor maps by a
transpose/reshape with no value reordering.

Primary use: the paired head-to-head parity experiment
(`scripts/parity_paired.py`). Initializing both implementations from the
SAME torch init removes init-distribution noise — the dominant per-seed
variance term in the unpaired head-to-head (per-seed σ≈0.03, so a 6v6
seed comparison only resolves ±0.017 against a ±0.01 bar) — making a
small paired-seed gate decisive. Also usable to load real reference
`.pt` checkpoints for serving.

Pure numpy: torch is only touched through `detach().cpu().numpy()` on the
caller's side (or here, defensively, when tensors are passed in).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def torch_state_dict_to_flax(state_dict: Dict) -> Dict:
    """Reference torch `state_dict()` → flax `params` tree (float32).

    Accepts torch tensors or numpy arrays as values. The block count is
    inferred from the `blocks.N.` keys. LayerScale entries are mapped when
    present (the reference swaps LayerScale for `nn.Identity` at
    layer_scale_init=0, dropping the `ls*.gamma` keys — our model
    likewise creates no `ls*` params then).

    Raises KeyError on a missing expected key — a transplant must be
    all-or-nothing, never a silent partial init.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    d = sd["patch_embed.weight"].shape[0]  # (D, 1, pk, pf, pt)

    p: Dict = {
        "patch_embed": {
            # Conv3d weight (D, 1, pk, pf, pt) → Dense kernel
            # (patch_dim, D); the model's patchify flattens (pk, pf, pt)
            # in exactly this axis order.
            "kernel": sd["patch_embed.weight"].reshape(d, -1).T,
            "bias": sd["patch_embed.bias"],
        },
        "pos_embed_k": sd["pos_embed_k"][0],
        "pos_embed_f": sd["pos_embed_f"][0],
        "pos_embed_t": sd["pos_embed_t"][0],
        "cls_token": sd["cls_token"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "head_fc1": {
            "kernel": sd["head.0.weight"].T, "bias": sd["head.0.bias"]
        },
        "head_fc2": {
            "kernel": sd["head.3.weight"].T, "bias": sd["head.3.bias"]
        },
    }

    n_layers = 1 + max(
        int(m.group(1))
        for m in (re.match(r"blocks\.(\d+)\.", k) for k in sd)
        if m
    )
    for i in range(n_layers):
        t = f"blocks.{i}."
        blk = {
            "norm1": {
                "scale": sd[t + "norm1.weight"], "bias": sd[t + "norm1.bias"]
            },
            "attn": {
                # torch qkv Linear weight (3D, D) → the (D, 3, D) fused
                # kernel: the transpose is the (D, 3D) Dense kernel whose
                # columns pack [q | k | v]; the reshape just names the
                # (3, D) column grouping (QKVProjection, models/vit.py).
                "qkv": {
                    "kernel": sd[t + "attn.qkv.weight"].T.reshape(d, 3, d),
                    "bias": sd[t + "attn.qkv.bias"].reshape(3, d),
                },
                "proj": {
                    "kernel": sd[t + "attn.proj.weight"].T,
                    "bias": sd[t + "attn.proj.bias"],
                },
            },
            "norm2": {
                "scale": sd[t + "norm2.weight"], "bias": sd[t + "norm2.bias"]
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[t + "mlp.fc1.weight"].T,
                    "bias": sd[t + "mlp.fc1.bias"],
                },
                "fc2": {
                    "kernel": sd[t + "mlp.fc2.weight"].T,
                    "bias": sd[t + "mlp.fc2.bias"],
                },
            },
        }
        if t + "ls1.gamma" in sd:
            blk["ls1"] = {"gamma": sd[t + "ls1.gamma"]}
            blk["ls2"] = {"gamma": sd[t + "ls2.gamma"]}
        p[f"block_{i}"] = blk
    return p


def assert_same_tree(reference_params, transplanted) -> None:
    """Fail loudly if the transplanted tree's structure or any leaf shape
    differs from a freshly-initialized param tree — a mismatch means the
    transplant would silently train a different model."""
    import jax

    ref_paths = {
        jax.tree_util.keystr(kp): leaf.shape
        for kp, leaf in jax.tree_util.tree_leaves_with_path(reference_params)
    }
    got_paths = {
        jax.tree_util.keystr(kp): leaf.shape
        for kp, leaf in jax.tree_util.tree_leaves_with_path(transplanted)
    }
    missing = sorted(set(ref_paths) - set(got_paths))
    extra = sorted(set(got_paths) - set(ref_paths))
    if missing or extra:
        raise ValueError(
            f"transplant tree mismatch: missing={missing} extra={extra}"
        )
    bad = [
        (k, ref_paths[k], got_paths[k])
        for k in ref_paths
        if tuple(ref_paths[k]) != tuple(got_paths[k])
    ]
    if bad:
        raise ValueError(f"transplant shape mismatch: {bad}")
