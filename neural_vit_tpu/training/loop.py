"""Jitted data-parallel training loop.

TPU-native rebuild of the reference loop (`training/train.py:108-305` and
the scheduler/early-stopping superset in `train_hptune.py:226-528`):

  * one jitted `train_step` (value_and_grad + optax AdamW) with donated
    state — forward, flash attention, loss, backward, and update compile to
    a single XLA program per step;
  * class-weighted label-smoothed CE with exact torch semantics
    (`ops/losses.py`), class weights from train-split label counts;
  * parallelism by sharding only: params/optimizer replicated (or
    Megatron-TP split over the 'model' axis), batches sharded over 'data' —
    XLA inserts the gradient all-reduce over ICI;
  * bf16 compute / f32 params replaces CUDA AMP + GradScaler (no loss
    scaling needed on TPU);
  * per-epoch metrics (loss/acc/AUC on train/val/test) with probabilities
    accumulated on device and one host transfer per epoch; ROC-AUC on host
    via sklearn exactly like the reference;
  * warmup-cosine schedule (epoch staircase) and early stopping on val AUC;
  * Orbax checkpoints: best-metric per epoch + final, plus restore.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from sklearn.metrics import roc_auc_score

from neural_vit_tpu.core.config import Temporal3DViTConfig, build_vit_config
from neural_vit_tpu.data.loader import BatchIterator, build_dataloaders
from neural_vit_tpu.models.vit import Temporal3DViT
from neural_vit_tpu.ops.losses import (
    class_weights_from_counts,
    weighted_smoothed_cross_entropy,
    weighted_smoothed_cross_entropy_sums,
)
from neural_vit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)
from neural_vit_tpu.training.checkpoint import (
    is_train_checkpoint,
    restore_checkpoint,
    restore_train_checkpoint,
    save_checkpoint,
    save_train_checkpoint,
    wait_for_saves,
)
from neural_vit_tpu.training.config import TrainConfig
from neural_vit_tpu.utils.preemption import (
    PreemptionGuard,
    clear_preemption,
    start_preemption_watcher,
)
from neural_vit_tpu.training.logging import (
    ExperimentLogger,
    build_run_id,
    log_config,
)
from neural_vit_tpu.training.schedule import (
    constant_schedule,
    warmup_cosine_epoch_schedule,
)


class TrainState(train_state.TrainState):
    # Exponential moving average of params (None = EMA off). Updated
    # inside the jitted step; val/test/checkpoints consume it when enabled.
    ema_params: Optional[dict] = None


def build_model_config(cfg: TrainConfig, freq_size: int, time_size: int) -> Temporal3DViTConfig:
    """Preset + overrides (reference `build_model`, train.py:53-74)."""
    return build_vit_config(
        cfg.model_size,
        n_trials=cfg.n_trials,
        freq_size=freq_size,
        time_size=time_size,
        patch_trial=cfg.patch_trial,
        patch_freq=cfg.patch_freq,
        patch_time=cfg.patch_time,
        embed_dim=cfg.embed_dim,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        mlp_ratio=cfg.mlp_ratio,
        dropout=cfg.dropout,
        attention_dropout=cfg.attention_dropout,
        drop_path=cfg.drop_path,
        compute_dtype=cfg.compute_dtype,
        use_flash_attention=cfg.use_flash_attention,
        remat=cfg.remat,
        gelu=cfg.gelu,
        norm_dtype=cfg.norm_dtype,
        pool=cfg.pool,
    )


def infer_input_dims(dataset) -> Tuple[int, int]:
    """(freq, time) from the data (reference train.py:48-50)."""
    return dataset.freq_size, dataset.time_size


def make_step_fns(model: Temporal3DViT, class_weights, label_smoothing: float,
                  compiler_options: Optional[dict] = None,
                  grad_accum: int = 1, ema_decay: float = 0.0):
    """Build jitted train/eval steps. Both return per-batch metric arrays:
    {loss_sum, correct, n_valid, probs} — probabilities stay on device for a
    single per-epoch host transfer.

    compiler_options: optional per-compile XLA overrides (e.g.
    {"xla_tpu_scoped_vmem_limit_kib": "32768"}). They travel with the
    executable, so they work over remote backends where TPU-only entries
    in the XLA_FLAGS env var would abort the local process.

    grad_accum: microbatch count for gradient accumulation. The batch is
    split into `grad_accum` equal microbatches scanned inside the one
    jitted step (activation memory drops ~grad_accum×); loss/weight SUMS
    accumulate across microbatches and normalize once, so the update is
    numerically the big-batch update, not a mean-of-means (torch weighted
    CE divides by the Σ of target-class weights — see ops/losses.py).

    ema_decay: when > 0, the step also advances `state.ema_params`
    (initialize it to the params — `TrainState.create(..., ema_params=
    params)`): ema ← decay·ema + (1−decay)·params, fused into the same
    XLA program as the optimizer update."""
    cw = jnp.asarray(class_weights) if class_weights is not None else None

    def _advance_ema(state: TrainState) -> TrainState:
        if ema_decay <= 0.0 or state.ema_params is None:
            return state
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            state.ema_params, state.params,
        )
        return state.replace(ema_params=new_ema)

    def _metrics(logits, labels, mask, loss):
        m = mask.astype(jnp.float32)
        n_valid = jnp.sum(m)
        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((preds == labels) * mask)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
        return {
            # Reference accumulates loss.item()*batch_n (train.py:229).
            "loss_sum": loss * n_valid,
            "correct": correct,
            "n_valid": n_valid,
            "probs": probs,
        }

    @partial(jax.jit, donate_argnums=(0,), compiler_options=compiler_options)
    def train_step(state: TrainState, vol, labels, mask, base_rng):
        # Per-step key derived inside the step from the traced step counter —
        # no host sync on state.step.
        rng = jax.random.fold_in(base_rng, state.step)

        if grad_accum == 1:
            def loss_fn(params):
                logits = model.apply(
                    {"params": params}, vol, train=True, rngs={"dropout": rng}
                )
                loss = weighted_smoothed_cross_entropy(
                    logits, labels, cw, label_smoothing, sample_mask=mask
                )
                return loss, logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            state = _advance_ema(state.apply_gradients(grads=grads))
            return state, _metrics(logits, labels, mask, loss)

        # Gradient accumulation: scan `grad_accum` microbatches, carrying
        # grad/loss/weight SUMS; normalize once by the total target-class
        # weight so the update equals the big-batch update exactly.
        if vol.shape[0] % grad_accum:
            raise ValueError(
                f"batch {vol.shape[0]} not divisible by grad_accum="
                f"{grad_accum}"
            )
        micro = vol.shape[0] // grad_accum

        def split(x):
            return x.reshape((grad_accum, micro) + x.shape[1:])

        def loss_sums(params, mv, ml, mm, mrng):
            logits = model.apply(
                {"params": params}, mv, train=True, rngs={"dropout": mrng}
            )
            ls, ws = weighted_smoothed_cross_entropy_sums(
                logits, ml, cw, label_smoothing, sample_mask=mm
            )
            return ls, (ws, logits)

        def body(carry, xs):
            gsum, lsum, wsum = carry
            mv, ml, mm, i = xs
            (ls, (ws, logits)), g = jax.value_and_grad(
                loss_sums, has_aux=True
            )(state.params, mv, ml, mm, jax.random.fold_in(rng, i))
            carry = (
                jax.tree_util.tree_map(jnp.add, gsum, g),
                lsum + ls,
                wsum + ws,
            )
            return carry, logits

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, p.dtype), state.params
        )
        (gsum, lsum, wsum), logits = jax.lax.scan(
            body,
            (zeros, jnp.float32(0.0), jnp.float32(0.0)),
            (split(vol), split(labels), split(mask),
             jnp.arange(grad_accum, dtype=jnp.uint32)),
        )
        denom = jnp.maximum(wsum, 1e-12)
        grads = jax.tree_util.tree_map(lambda g: g / denom, gsum)
        loss = lsum / denom
        logits = logits.reshape((vol.shape[0],) + logits.shape[2:])
        state = _advance_ema(state.apply_gradients(grads=grads))
        return state, _metrics(logits, labels, mask, loss)

    @partial(jax.jit, compiler_options=compiler_options)
    def eval_step(params, vol, labels, mask):
        logits = model.apply({"params": params}, vol, train=False)
        loss = weighted_smoothed_cross_entropy(
            logits, labels, cw, label_smoothing, sample_mask=mask
        )
        return _metrics(logits, labels, mask, loss)

    return train_step, eval_step


def _host_labels(labels, mask) -> Tuple[np.ndarray, np.ndarray]:
    """(labels, mask) as THIS PROCESS's host rows. Single process: the full
    batch. Multi-host: only the rows this process's devices own (global
    arrays can't be fetched whole by one process) — `_finalize_epoch`
    allgathers them before the AUC."""
    from neural_vit_tpu.parallel.multihost import local_shards_np

    return local_shards_np(labels), np.asarray(local_shards_np(mask), bool)


def _finalize_epoch(metric_batches, label_batches) -> Dict[str, float]:
    """One host transfer per epoch: `device_get` fetches every accumulated
    per-batch metric (scalars and prob vectors) in a single D2H trip, then
    reduction happens in numpy.

    Multi-host: the loss/acc sums are replicated scalars (already global —
    the jitted step reduces over the global batch), while prob rows are
    sharded across hosts; each process fetches its local rows and a
    `process_allgather` assembles identical AUC inputs everywhere."""
    if jax.process_count() > 1:
        from neural_vit_tpu.parallel.multihost import (
            allgather_rows,
            local_shards_np,
        )

        loss_sum = float(sum(float(m["loss_sum"]) for m in metric_batches))
        correct = float(sum(float(m["correct"]) for m in metric_batches))
        total = float(sum(float(m["n_valid"]) for m in metric_batches))
        # Gather FIXED-SIZE per-process rows and mask AFTER: masking before
        # the gather makes per-process shapes diverge on padded batches
        # (one host can own only pad rows → a (0,)-shaped contribution),
        # and a shape-mismatched process_allgather deadlocks — the
        # empty-side process skips the collective the other is blocked in.
        probs, labels, masks = [], [], []
        for m, (lab, mask) in zip(metric_batches, label_batches):
            probs.append(local_shards_np(m["probs"]))
            labels.append(lab)
            masks.append(mask)
        cat = lambda xs, dt: (  # noqa: E731
            np.concatenate(xs) if xs else np.zeros((0,), dt)
        )
        probs = allgather_rows(cat(probs, np.float32))
        labels = allgather_rows(cat(labels, np.int64))
        valid = allgather_rows(cat(masks, bool).astype(np.int8)).astype(bool)
        probs, labels = probs[valid], labels[valid]
        try:
            auc = float(roc_auc_score(labels, probs))
        except ValueError:
            auc = float("nan")
        if total == 0.0:
            return {"loss": float("nan"), "acc": float("nan"), "auc": auc}
        return {"loss": loss_sum / total, "acc": correct / total, "auc": auc}

    metric_batches = jax.device_get(metric_batches)
    loss_sum = float(sum(m["loss_sum"] for m in metric_batches))
    correct = float(sum(m["correct"] for m in metric_batches))
    total = float(sum(m["n_valid"] for m in metric_batches))
    probs, labels = [], []
    for m, (lab, mask) in zip(metric_batches, label_batches):
        p = np.asarray(m["probs"])
        probs.append(p[mask])
        labels.append(lab[mask])
    probs = np.concatenate(probs) if probs else np.array([])
    labels = np.concatenate(labels) if labels else np.array([])
    try:
        auc = float(roc_auc_score(labels, probs))
    except ValueError:
        auc = float("nan")
    if total == 0.0:
        # Zero samples this pass (e.g. a mid-epoch resume that had already
        # consumed every batch of the interrupted epoch): loss/acc of 0.0
        # would read as a perfect epoch — report NaN instead.
        return {"loss": float("nan"), "acc": float("nan"), "auc": auc}
    return {
        "loss": loss_sum / total,
        "acc": correct / total,
        "auc": auc,
    }


def evaluate(
    eval_step,
    params,
    iterator: BatchIterator,
) -> Dict[str, float]:
    """Eval pass (reference `evaluate`, train.py:77-105)."""
    metric_batches, label_batches = [], []
    for vol, labels, mask in iterator:
        m = eval_step(params, vol, labels, mask)
        metric_batches.append(m)
        label_batches.append(_host_labels(labels, mask))
    return _finalize_epoch(metric_batches, label_batches)


def train(cfg: TrainConfig, *, epoch_callback=None) -> Dict:
    """Full training run (reference `train`, training/train.py:108-305).

    Args:
        cfg: training configuration.
        epoch_callback: optional `(epoch, metrics_dict) -> None` hook invoked
            after every epoch's validation (metrics keys: loss/acc/auc and
            val_loss/val_acc/val_auc) — the HP-tune entry reports the tuner
            metric from here each epoch.

    Returns a results dict with final/best metrics and checkpoint locations.
    """
    if not cfg.train_paths or not cfg.val_paths or not cfg.test_paths:
        raise ValueError("train_paths, val_paths, and test_paths must be provided.")
    if not cfg.use_preprocessed:
        raise ValueError(
            "Training expects preprocessed spectrograms. Set use_preprocessed=True."
        )
    if not cfg.spectrogram_column:
        raise ValueError("spectrogram_column must be set for preprocessed datasets.")

    mesh = make_mesh(cfg.mesh)
    multi_device = mesh.devices.size > 1
    b_shard = batch_sharding(mesh) if multi_device else None
    print(f"Devices: {mesh.devices.size} ({jax.default_backend()}), "
          f"mesh data={mesh.shape['data']} model={mesh.shape['model']}")

    print("Initializing training/validation/test datasets...")
    train_it, val_it, test_it, (train_ds, val_ds, test_ds) = build_dataloaders(
        cfg.train_paths, cfg.val_paths, cfg.test_paths,
        n_trials=cfg.n_trials, stride=cfg.stride,
        spectrogram_column=cfg.spectrogram_column,
        loader_cfg=cfg.loader, batch_sharding=b_shard,
    )
    print(f"Train: {len(train_ds)}, Val: {len(val_ds)}, Test: {len(test_ds)} sequences")

    if cfg.freq_size and cfg.time_size:
        freq_size, time_size = cfg.freq_size, cfg.time_size
    else:
        freq_size, time_size = infer_input_dims(train_ds)
    model_config = build_model_config(cfg, freq_size, time_size)
    # Under tensor parallelism the attention core needs the mesh explicitly
    # (shard_map around the Pallas kernel); everything else is shardings.
    model = Temporal3DViT(
        model_config, mesh=mesh if mesh.shape["model"] > 1 else None
    )
    if cfg.loader.tile_patches is not None:
        want = (model_config.patch_trial, model_config.patch_freq,
                model_config.patch_time)
        if tuple(cfg.loader.tile_patches) != want:
            raise ValueError(
                f"loader.tile_patches {cfg.loader.tile_patches} must match "
                f"the model's patch dims {want}"
            )

    # Class-weighted CE from train-split counts (train.py:157-170).
    counts = np.bincount(train_ds.labels, minlength=model_config.n_classes)
    class_weights = class_weights_from_counts(counts)

    steps_per_epoch = max(1, len(train_it))
    if cfg.use_cosine_schedule:
        schedule = warmup_cosine_epoch_schedule(
            cfg.lr, warmup_epochs=cfg.warmup_epochs, total_epochs=cfg.epochs,
            min_lr=cfg.min_lr, steps_per_epoch=steps_per_epoch,
        )
    else:
        schedule = constant_schedule(cfg.lr)
    tx = optax.adamw(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay,
    )

    init_rng = jax.random.key(cfg.seed)
    sample = jnp.zeros((1, cfg.n_trials, freq_size, time_size), jnp.float32)
    variables = model.init(init_rng, sample)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    print(f"Model parameters: {n_params:,}")

    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        ema_params=(jax.tree_util.tree_map(jnp.copy, variables["params"])
                    if cfg.ema_decay > 0 else None),
    )

    def eval_params(s: TrainState):
        """What val/test/checkpoints consume: the EMA shadow when enabled."""
        return s.ema_params if cfg.ema_decay > 0 else s.params

    # ---- resume ----
    # Full-state checkpoint ("latest") ⇒ EXACT resume: optimizer moments,
    # step counter (LR schedule + per-step dropout fold_in), epoch, best
    # metrics, patience counter, and the dropout seed all continue.
    # Params-only checkpoint (best/final) ⇒ warm start, as before.
    start_epoch = 1
    resume_skip = 0  # batches of start_epoch already consumed pre-preemption
    dropout_seed = cfg.seed + 1
    best = {"val_acc": 0.0, "val_auc": 0.0}
    epochs_without_improvement = 0
    if cfg.resume_from:
        directory, _, name = cfg.resume_from.rpartition("/")
        if is_train_checkpoint(cfg.resume_from):
            tree, restored_cfg, loop_state = restore_train_checkpoint(
                directory, name, state
            )
            if restored_cfg != model_config:
                raise ValueError(
                    "Checkpoint model config does not match the configured "
                    f"model: {restored_cfg} vs {model_config}"
                )
            state = state.replace(
                params=tree["params"], opt_state=tree["opt_state"],
                step=int(tree["step"]),
                # ema_decay save/resume mismatches fail fast inside
                # restore_train_checkpoint (sidecar has_ema pre-check), so
                # by here the tree's EMA presence matches cfg.ema_decay.
                ema_params=tree.get("ema_params", state.ema_params),
            )
            start_epoch = int(loop_state["epoch"]) + 1
            # Mid-epoch (preemption) checkpoints record how many batches of
            # the interrupted epoch were already stepped; skip exactly those
            # on the first epoch iterated (shuffle is (seed, epoch)-pure).
            resume_skip = int(loop_state.get("batch_in_epoch", 0))
            dropout_seed = int(loop_state["dropout_seed"])
            best = {"val_acc": float(loop_state["best_val_acc"]),
                    "val_auc": float(loop_state["best_val_auc"])}
            epochs_without_improvement = int(
                loop_state["epochs_without_improvement"]
            )
            print(f"Resumed full train state from {cfg.resume_from} "
                  f"(continuing at epoch {start_epoch})")
        else:
            params, restored_cfg, extra = restore_checkpoint(
                directory, name,
                abstract_params=jax.eval_shape(lambda: state.params),
            )
            if restored_cfg != model_config:
                raise ValueError(
                    "Checkpoint model config does not match the configured "
                    f"model: {restored_cfg} vs {model_config}"
                )
            state = state.replace(
                params=params,
                # Re-seed the EMA shadow from the restored params — leaving
                # it at the fresh random init would contaminate every eval
                # for ~1/(1-decay) steps.
                ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                            if cfg.ema_decay > 0 else None),
            )
            print(f"Warm-started params from {cfg.resume_from} (extra: {extra})")

    dropout_rng = jax.random.key(dropout_seed, impl=cfg.prng_impl)
    # Place the whole state on the mesh: TP rules where they match
    # (params and the mirrored AdamW mu/nu trees), replicated elsewhere.
    state = jax.device_put(state, param_shardings(state, mesh))

    # xla_tpu_* compile options only exist on the TPU backend — the CPU
    # compiler rejects them at compile time, so drop the knob off-TPU
    # (tests and dry-runs share this code path).
    on_tpu = jax.devices()[0].platform == "tpu"
    train_step, eval_step = make_step_fns(
        model, class_weights, cfg.label_smoothing,
        compiler_options=(
            {"xla_tpu_scoped_vmem_limit_kib": str(cfg.scoped_vmem_limit_kib)}
            if (cfg.scoped_vmem_limit_kib and on_tpu) else None
        ),
        grad_accum=cfg.grad_accum_steps,
        ema_decay=cfg.ema_decay,
    )

    # ---- logging / checkpoints (reference train.py:172-204) ----
    output_dir = (
        cfg.output_dir
        or os.environ.get("AIP_MODEL_DIR")
        or os.environ.get("AIP_CHECKPOINT_DIR")
    )
    run_id = cfg.run_name or build_run_id()
    checkpoint_dir = None
    if output_dir:
        checkpoint_dir = f"{output_dir.rstrip('/')}/{run_id}/checkpoints"
    logger = ExperimentLogger(
        run_id=run_id, output_dir=output_dir, project_id=cfg.project_id,
        location=cfg.location, experiment_name=cfg.experiment_name,
    )
    log_config(logger, cfg)
    logger.log_params(
        {
            "train_sequences": len(train_ds),
            "val_sequences": len(val_ds),
            "test_sequences": len(test_ds),
            "class_0_count": int(counts[0]) if counts.size > 0 else 0,
            "class_1_count": int(counts[1]) if counts.size > 1 else 0,
            "n_params": n_params,
            "mesh_data": int(mesh.shape["data"]),
            "mesh_model": int(mesh.shape["model"]),
        }
    )

    best_ckpt = None
    epochs_trained = start_epoch - 1
    history = []
    results: Dict = {}
    preempted = False
    stopped_early = False
    train_it.set_epoch(start_epoch - 1)  # replay the exact shuffle sequence
    if resume_skip:
        train_it.skip_next(resume_skip)
        print(f"Mid-epoch resume: skipping the first {resume_skip} batches "
              f"of epoch {start_epoch}")
    # SIGTERM (TPU-VM eviction) → full-state checkpoint at the next step
    # boundary + clean exit; paired with the try/finally below. On real TPU
    # hardware a metadata watcher additionally catches GCE maintenance
    # events announced ahead of the signal (daemon thread; exits by itself
    # off-GCE).
    guard = PreemptionGuard(enabled=cfg.handle_preemption).__enter__()
    if cfg.handle_preemption and on_tpu:
        start_preemption_watcher()
    try:
        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = time.perf_counter()
            batch_base = resume_skip if epoch == start_epoch else 0
            metric_batches, label_batches = [], []
            for k, (vol, labels, mask) in enumerate(train_it):
                state, m = train_step(state, vol, labels, mask, dropout_rng)
                metric_batches.append(m)
                label_batches.append(_host_labels(labels, mask))
                if guard.requested:
                    if checkpoint_dir:
                        save_train_checkpoint(
                            checkpoint_dir, "latest", state, model_config,
                            loop_state={
                                # Same convention as the epoch-end save:
                                # "epoch" = last COMPLETED epoch; the extra
                                # batch_in_epoch marks progress inside the
                                # interrupted one.
                                "epoch": epoch - 1,
                                "batch_in_epoch": batch_base + k + 1,
                                "dropout_seed": dropout_seed,
                                "best_val_acc": best["val_acc"],
                                "best_val_auc": best["val_auc"],
                                "epochs_without_improvement":
                                    epochs_without_improvement,
                            },
                        )
                    preempted = True
                    break
            if preempted:
                where = (f"{checkpoint_dir}/latest" if checkpoint_dir
                         else "NOWHERE (no output_dir — state lost)")
                print(f"Preemption requested: saved full train state "
                      f"mid-epoch {epoch} (after {batch_base + k + 1} "
                      f"batches) to {where}")
                break
            if epoch == start_epoch and resume_skip and not metric_batches:
                print(
                    f"Mid-epoch resume: epoch {epoch}'s train batches were "
                    "all stepped before preemption — train metrics for this "
                    "epoch are NaN (val metrics below are real)"
                )
            tm = _finalize_epoch(metric_batches, label_batches)
            vm = evaluate(eval_step, eval_params(state), val_it)
            dt = time.perf_counter() - t0
            epochs_trained = epoch

            metrics = {
                "train/loss": tm["loss"], "train/acc": tm["acc"],
                "train/auc": tm["auc"],
                "val/loss": vm["loss"], "val/acc": vm["acc"],
                "val/auc": vm["auc"],
                # Observability beyond the reference: per-epoch wall time in
                # the same JSONL stream (collectors ignore unknown keys).
                "perf/epoch_s": dt,
            }
            logger.log_metrics(metrics, step=epoch)
            history.append({"epoch": epoch, **metrics})
            print(
                f"Epoch {epoch}/{cfg.epochs} | "
                f"train loss {tm['loss']:.4f}, acc {tm['acc']:.4f}, auc {tm['auc']:.4f} | "
                f"val loss {vm['loss']:.4f}, acc {vm['acc']:.4f}, auc {vm['auc']:.4f} | "
                f"{dt:.1f}s"
            )

            # Best-metric checkpoint + early stopping.
            monitored = vm["acc"] if cfg.checkpoint_metric == "val_acc" else vm["auc"]
            best_key = "val_acc" if cfg.checkpoint_metric == "val_acc" else "val_auc"
            improved = monitored > best[best_key]
            best["val_acc"] = max(best["val_acc"], vm["acc"])
            best["val_auc"] = max(
                best["val_auc"], vm["auc"] if np.isfinite(vm["auc"]) else 0.0
            )
            epochs_without_improvement = (
                0 if improved else epochs_without_improvement + 1
            )

            if guard.requested:
                # Eviction arrived during the val pass or epoch bookkeeping
                # (the in-epoch check above only fires at step boundaries,
                # and at production dims a val pass is a large slice of the
                # ~30 s grace window). Persist the full state at the epoch
                # boundary now — skipping the best-metric params checkpoint
                # to keep the grace window — and exit.
                if checkpoint_dir:
                    save_train_checkpoint(
                        checkpoint_dir, "latest", state, model_config,
                        loop_state={
                            "epoch": epoch,
                            "dropout_seed": dropout_seed,
                            "best_val_acc": best["val_acc"],
                            "best_val_auc": best["val_auc"],
                            "epochs_without_improvement":
                                epochs_without_improvement,
                        },
                    )
                preempted = True
                where = (f"{checkpoint_dir}/latest" if checkpoint_dir
                         else "NOWHERE (no output_dir — state lost)")
                print(f"Preemption requested: saved full train state at "
                      f"end of epoch {epoch} to {where}")
                break

            if improved and checkpoint_dir:
                best_ckpt = save_checkpoint(
                    checkpoint_dir, f"best_epoch_{epoch}",
                    eval_params(state), model_config,
                    extra={"epoch": epoch, "val_acc": vm["acc"],
                           "val_auc": vm["auc"]},
                )

            if epoch_callback is not None:
                # Per-epoch hook (HP-tune reports val_auc to the tuner here
                # every epoch, reference train_hptune.py:460).
                epoch_callback(epoch, {**tm, **{f"val_{k}": v
                                                for k, v in vm.items()}})

            if (
                checkpoint_dir
                and cfg.latest_checkpoint_every > 0
                and epoch % cfg.latest_checkpoint_every == 0
            ):
                # Non-blocking: the next epoch computes while this commits
                # on the writer thread (wait_for_saves() in the finally —
                # and the mid-epoch preemption save above stays blocking,
                # because that grace window must not race the writer).
                save_train_checkpoint(
                    checkpoint_dir, "latest", state, model_config,
                    loop_state={
                        "epoch": epoch,
                        "dropout_seed": dropout_seed,
                        "best_val_acc": best["val_acc"],
                        "best_val_auc": best["val_auc"],
                        "epochs_without_improvement": epochs_without_improvement,
                    },
                    block=False,
                )

            if (
                cfg.early_stopping_patience > 0
                and epochs_without_improvement >= cfg.early_stopping_patience
            ):
                print(
                    f"Early stopping at epoch {epoch} (no improvement for "
                    f"{cfg.early_stopping_patience} epochs)"
                )
                break

            if (
                cfg.stop_after_epoch
                and epoch >= cfg.stop_after_epoch
                and epoch < cfg.epochs
            ):
                # Driver-initiated pause (successive-halving rung budget):
                # the run resumes later from the "latest" full-state
                # checkpoint, so one must exist at exactly this epoch.
                if checkpoint_dir and not (
                    cfg.latest_checkpoint_every > 0
                    and epoch % cfg.latest_checkpoint_every == 0
                ):
                    save_train_checkpoint(
                        checkpoint_dir, "latest", state, model_config,
                        loop_state={
                            "epoch": epoch,
                            "dropout_seed": dropout_seed,
                            "best_val_acc": best["val_acc"],
                            "best_val_auc": best["val_auc"],
                            "epochs_without_improvement":
                                epochs_without_improvement,
                        },
                        block=False,
                    )
                stopped_early = True
                print(f"Paused after epoch {epoch} "
                      f"(stop_after_epoch={cfg.stop_after_epoch})")
                break

        if preempted:
            # Eviction grace windows are short: no test eval, no final
            # params-only checkpoint — the "latest" full-state checkpoint
            # above is the restart point.
            results = {
                "run_id": run_id,
                "preempted": True,
                "epochs_trained": epochs_trained,
                "best_val_acc": best["val_acc"],
                "best_val_auc": best["val_auc"],
                "history": history,
                "n_params": n_params,
            }
            if checkpoint_dir:
                results["resume_checkpoint"] = f"{checkpoint_dir}/latest"
        elif stopped_early:
            # Rung pause: no test eval (the trial may be killed, not
            # promoted — test stays untouched until a full run finishes).
            results = {
                "run_id": run_id,
                "stopped_early": True,
                "epochs_trained": epochs_trained,
                "best_val_acc": best["val_acc"],
                "best_val_auc": best["val_auc"],
                "history": history,
                "n_params": n_params,
            }
            if checkpoint_dir:
                results["resume_checkpoint"] = f"{checkpoint_dir}/latest"
        else:
            test_m = evaluate(eval_step, eval_params(state), test_it)
            logger.log_metrics(
                {
                    "test/loss": test_m["loss"], "test/acc": test_m["acc"],
                    "test/auc": test_m["auc"],
                },
                step=cfg.epochs + 1,
            )
            print(
                f"Test loss {test_m['loss']:.4f}, acc {test_m['acc']:.4f}, "
                f"auc {test_m['auc']:.4f}"
            )
            results = {
                "run_id": run_id,
                "epochs_trained": epochs_trained,
                "best_val_acc": best["val_acc"],
                "best_val_auc": best["val_auc"],
                "test_loss": test_m["loss"],
                "test_acc": test_m["acc"],
                "test_auc": test_m["auc"],
                "history": history,
                "n_params": n_params,
            }
    finally:
        wait_for_saves()  # async "latest" saves must commit before exit
        guard.__exit__()
        if preempted:
            # The request was consumed (full state saved). The flag is
            # process-global and sticky — left set, it would terminate
            # every subsequent train() in this process (e.g. the next
            # in-process sweep trial) after exactly one batch.
            clear_preemption()
        logger.close()

    if preempted or stopped_early:
        return results
    if checkpoint_dir:
        final = save_checkpoint(
            checkpoint_dir, "final", eval_params(state), model_config,
            extra={"best_val_acc": best["val_acc"], "best_val_auc": best["val_auc"]},
        )
        results["final_checkpoint"] = final
        results["best_checkpoint"] = best_ckpt
    return results


def main():  # pragma: no cover — CLI entry mirroring reference train.py:308
    bucket = "lfp_spec_datasets"
    prefix = "neural/v2"
    output_dir = (
        os.environ.get("AIP_MODEL_DIR")
        or os.environ.get("AIP_CHECKPOINT_DIR")
        or "runs/run1"
    )
    cfg = TrainConfig(
        train_paths=[f"gs://{bucket}/{prefix}/train_preprocessed.parquet"],
        val_paths=[f"gs://{bucket}/{prefix}/val_preprocessed.parquet"],
        test_paths=[f"gs://{bucket}/{prefix}/test_preprocessed.parquet"],
        use_preprocessed=True,
        output_dir=output_dir,
        model_size="small",
        experiment_name="lfp-temporal-vit-experiments",
        project_id="lfp-temporal-vit",
        location="us-central1",
    )
    train(cfg)


if __name__ == "__main__":  # pragma: no cover
    main()
