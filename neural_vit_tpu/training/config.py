"""Training configuration.

Field-for-field parity with the reference `TrainConfig`
(`training/config.py:10-45`) plus the TPU-native execution surface (mesh
spec, dtype, schedule/early-stopping from the HP-tune path, checkpoint
metric). `device` is replaced by `mesh`: parallelism is a mesh shape, not a
device string.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union

from neural_vit_tpu.data.loader import DataLoaderConfig
from neural_vit_tpu.parallel.mesh import MeshSpec


@dataclass
class TrainConfig:
    train_paths: List[str] = field(default_factory=list)
    val_paths: List[str] = field(default_factory=list)
    test_paths: List[str] = field(default_factory=list)
    output_dir: Optional[str] = None
    use_preprocessed: bool = True
    spectrogram_column: str = "spectrogram"

    epochs: int = 20
    loader: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    lr: float = 3e-4
    weight_decay: float = 0.01
    label_smoothing: float = 0.05
    experiment_name: Optional[str] = None
    run_name: Optional[str] = None
    project_id: Optional[str] = None
    location: Optional[str] = None

    n_trials: int = 8
    stride: int = 4

    model_size: str = "small"
    freq_size: Optional[int] = None
    time_size: Optional[int] = None
    patch_trial: Optional[int] = None
    patch_freq: Optional[int] = None
    patch_time: Optional[int] = None
    embed_dim: Optional[int] = None
    n_heads: Optional[int] = None
    n_layers: Optional[int] = None
    mlp_ratio: Optional[float] = None
    dropout: float = 0.2
    attention_dropout: float = 0.1
    drop_path: float = 0.1

    # --- schedule / early stopping (reference train_hptune.py:192-223) ---
    use_cosine_schedule: bool = False  # False ⇒ constant lr (train.py parity)
    warmup_epochs: int = 3
    min_lr: float = 1e-6
    early_stopping_patience: int = 0  # 0 ⇒ disabled

    # Exponential moving average of the params (0 ⇒ off). When on, the
    # jitted train step also advances an EMA shadow copy (decay·ema +
    # (1−decay)·params — fused into the same XLA program, no extra
    # dispatch), and val/test/best-checkpoints consume the shadow instead
    # of the raw params. A quality lever the reference lacks; standard for
    # production ViT training (e.g. 0.999). Costs 1× param bytes of HBM.
    ema_decay: float = 0.0

    # --- checkpointing ---
    checkpoint_metric: str = "val_acc"  # train.py uses val_acc; hptune val_auc
    # Resume: "<dir>/<name>" of a saved checkpoint (no load path exists in
    # the reference — SURVEY §5 — but TPU pods preempt, so resume is
    # first-class here). A full-state checkpoint ("latest", written every
    # `latest_checkpoint_every` epochs) resumes EXACTLY: params, optimizer
    # moments, step counter, epoch, best-metric state, patience, and the
    # dropout seed. A params-only checkpoint (best/final) warm-starts.
    resume_from: Optional[str] = None
    # Full-state saves move params + both AdamW moment trees to host
    # (~3× param bytes, ≈170 MB for 'small') — sub-second on a TPU VM, but
    # worth raising (or 0 ⇒ off) on slow transports where it would tax every
    # epoch for runs that never get preempted.
    latest_checkpoint_every: int = 1  # 0 ⇒ no full-state checkpoints
    # Pause the run after this epoch (1-based, inclusive) while keeping the
    # LR schedule keyed to `epochs`: the loop saves the "latest" full-state
    # checkpoint and returns without the test eval, exactly like a
    # preemption pause but driver-initiated. Successive-halving HP search
    # trains rung k to its budget, promotes, and RESUMES the survivors from
    # that checkpoint — each trial's trajectory is one continuous run.
    stop_after_epoch: Optional[int] = None
    # Catch SIGTERM (GCE/TPU-VM eviction) — or a programmatic
    # `utils.preemption.request_preemption()` from a metadata watcher —
    # checkpoint the full train state MID-EPOCH at the next step boundary
    # (incl. the position inside the epoch), and exit cleanly. Resume from
    # that checkpoint is step-exact. Requires an output_dir.
    handle_preemption: bool = True

    # --- TPU execution ---
    mesh: MeshSpec = field(default_factory=MeshSpec)
    seed: int = 0
    # Gradient accumulation: split each batch into this many microbatches
    # scanned inside the jitted step (activation memory ÷ grad_accum_steps;
    # the update is numerically the big-batch update — loss/weight sums
    # normalize once, see ops/losses.py). An HBM lever alongside `remat`
    # for long-sequence / large-model configs; 1 = off.
    grad_accum_steps: int = 1
    compute_dtype: str = "bfloat16"
    use_flash_attention: bool = True
    remat: Union[bool, str] = False  # rematerialize in backward: True/
                                     # "block" = whole blocks, "mlp" = only
                                     # the MLP sub-block (cheaper; no
                                     # attention recompute)
    gelu: str = "erf"            # "tanh" = fast approximation (see model cfg)
    norm_dtype: str = "float32"  # "bfloat16" = fast LayerNorm compute
    pool: str = "cls"            # "mean"/"probe" = CLS-free readouts: the
                                 # token count becomes the bare patch grid
                                 # (lane-aligned 512 vs 513 at default dims
                                 # — no Mosaic pad tax in attention).
                                 # "probe" adds a learned attention-pool
                                 # (MAP head) where "mean" just averages.
    # PRNG for dropout/drop-path streams. 'rbg' lowers to the XLA
    # RngBitGenerator (hardware-accelerated on TPU); the default threefry
    # costs ~25% of a train step generating the big dropout masks.
    prng_impl: str = "rbg"
    # XLA scoped-VMEM limit (KiB) for the jitted steps, sent per-compile
    # via compiler_options (TPU-only XLA_FLAGS abort local processes on
    # remote backends). Changes XLA's fusion working-set decisions;
    # measured NON-monotonic: 24576 → 1,584 v/s on the bench config vs
    # 1,510 at the 16 MiB default, but 32768 → 1,459 (docs/ROOFLINE.md).
    # None = compiler default. Re-sweep when the model shape changes.
    scoped_vmem_limit_kib: Optional[int] = None
