"""Streaming two-pass preprocessing: raw trial parquet → normalized
log-spectrogram parquet.

TPU-native equivalent of the reference's offline pipeline
(`data/preprocess_to_gcs.py`): identical streaming structure (arrow record
batches in, incremental ParquetWriter out, pass-1 train-only Σ/Σ²/count
stats, pass-2 z-normalized emission) but the per-trace scipy STFT loop is
replaced by the fused device program in `ops/spectrogram.py` — each arrow
batch becomes ONE device call computing every spectrogram in the batch on
the MXU.

Schema compatibility: the output parquet carries the input columns plus a
`spectrogram` list<list<float>> column (and optionally the trace), exactly
like the reference, so its eval/baseline tooling can read our datasets and
vice versa. Rows whose trace is shorter than the analysis window are dropped
(reference `preprocess_to_gcs.py:51`).

Backend selection: pass `backend="cpu"` to pin the fused op to the host CPU
— right when the accelerator sits behind a thin transport (e.g. a tunneled
dev TPU at a few MB/s) where shipping traces up and spectrograms back would
drown the compute. On a real TPU VM (co-located HBM), leave it on the
default device.
"""

from __future__ import annotations

from contextlib import nullcontext
from typing import Iterable, Optional

import jax
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from neural_vit_tpu.data.parquet_io import (
    coerce_paths,
    ensure_local_parent,
    filesystem_for,
    open_dataset,
    strip_scheme,
    write_json,
)
from neural_vit_tpu.data.sequences import stack_traces
from neural_vit_tpu.ops.spectrogram import (
    SpectrogramConfig,
    finalize_stats,
    preprocess_traces,
    spectrogram_stats_batch,
)


def _batched_traces(df, cfg: SpectrogramConfig):
    """Parse + stack one arrow batch's traces; returns (dense, valid)."""
    need = int(cfg.end_time * cfg.fs) if cfg.apply_time_window else None
    return stack_traces(df["trace"].tolist(), expected_len=need)


def _device_specs(dense: np.ndarray, cfg: SpectrogramConfig,
                  stats: Optional[dict], batch_pad: int) -> np.ndarray:
    """Fused device call with shape padding to avoid per-batch recompiles."""
    n = dense.shape[0]
    if n < batch_pad:
        dense = np.concatenate(
            [dense, np.zeros((batch_pad - n, dense.shape[1]), dense.dtype)]
        )
    if stats is not None:
        out = preprocess_traces(
            dense, cfg, stats["mean"], stats["std"], normalize=True
        )
    else:
        out = preprocess_traces(dense, cfg)
    return np.asarray(out[:n])


def _device_ctx(backend: Optional[str]):
    if backend is None:
        return nullcontext()
    return jax.default_device(jax.local_devices(backend=backend)[0])


def compute_spectrogram_stats(
    input_paths: Iterable[str] | str,
    cfg: SpectrogramConfig,
    batch_size: int = 2048,
    backend: Optional[str] = None,
) -> dict:
    """Pass 1 — stream the *train* split, accumulating Σ, Σ², count of all
    log-spectrogram pixels (reference `preprocess_to_gcs.py:72-124`).
    Reduction runs jitted on device; scalars accumulate on host in float64.
    """
    dataset = open_dataset(coerce_paths(input_paths))
    scanner = dataset.scanner(batch_size=batch_size)
    total_s = total_sq = 0.0
    total_n = 0
    with _device_ctx(backend):
        for batch in scanner.to_batches():
            df = batch.to_pandas()
            dense, valid = _batched_traces(df, cfg)
            dense = dense[valid]
            if dense.shape[0] == 0:
                continue
            # Pad to the nominal batch size: arrow may yield ragged batch
            # lengths and every distinct shape is a fresh XLA compile.
            n_real = dense.shape[0]
            if n_real < batch_size:
                dense = np.concatenate(
                    [dense, np.zeros((batch_size - n_real, dense.shape[1]),
                                     dense.dtype)]
                )
            s, sq, n = spectrogram_stats_batch(dense, cfg, n_valid=n_real)
            total_s += float(s)
            total_sq += float(sq)
            total_n += int(n)
    return finalize_stats(total_s, total_sq, total_n)


def preprocess_parquet(
    input_paths: Iterable[str] | str,
    output_path: str,
    cfg: SpectrogramConfig,
    normalize_stats: Optional[dict] = None,
    keep_trace: bool = True,
    batch_size: int = 2048,
    verbose: bool = True,
    backend: Optional[str] = None,
) -> int:
    """Pass 2 — stream a split, emit spectrogram parquet
    (reference `preprocess_to_gcs.py:127-221`). Returns rows written."""
    input_paths = coerce_paths(input_paths)
    if not input_paths:
        raise ValueError("input_paths must contain at least one path.")
    ensure_local_parent(output_path)
    dataset = open_dataset(input_paths)
    scanner = dataset.scanner(batch_size=batch_size)

    writer = None
    rows_written = 0
    try:
        with _device_ctx(backend):
            for idx, batch in enumerate(scanner.to_batches()):
                df = batch.to_pandas()
                dense, valid = _batched_traces(df, cfg)
                df = df[valid].reset_index(drop=True)
                dense = dense[valid]
                if dense.shape[0] == 0:
                    continue
                specs = _device_specs(dense, cfg, normalize_stats, batch_size)
                # Build the spectrogram column as an explicit
                # list<list<float32>> arrow array — `tolist()` would go
                # through Python floats and land as float64, doubling dataset
                # size and IO.
                n, nf, nt = specs.shape
                spec_col = pa.ListArray.from_arrays(
                    pa.array(np.arange(0, n * nf + 1, dtype=np.int32) * nt),
                    pa.array(specs.reshape(-1)),
                )
                spec_col = pa.ListArray.from_arrays(
                    pa.array(np.arange(0, n + 1, dtype=np.int32) * nf),
                    spec_col,
                )
                if keep_trace:
                    # Reference trace-column semantics (_preprocess_frame,
                    # preprocess_to_gcs.py:44-52): baseline mean over the
                    # FULL trace's first baseline_end seconds, then window
                    # [start_time : end_time]. `dense` holds samples from
                    # t=0, so dense[:, :nb] is the full-trace baseline.
                    nb = int(cfg.baseline_end * cfg.fs)
                    corrected = dense - dense[:, :nb].mean(
                        axis=1, keepdims=True
                    )
                    start = int(cfg.start_time * cfg.fs)
                    windowed = corrected[:, start:] if start else corrected
                    lt = windowed.shape[1]
                    df = df.drop(columns=["trace"])
                    trace_col = pa.ListArray.from_arrays(
                        pa.array(np.arange(0, n + 1, dtype=np.int32) * lt),
                        pa.array(windowed.reshape(-1)),
                    )
                else:
                    df = df.drop(columns=["trace"])
                    trace_col = None
                table = pa.Table.from_pandas(df, preserve_index=False)
                table = table.append_column("spectrogram", spec_col)
                if trace_col is not None:
                    table = table.append_column("trace", trace_col)
                if writer is None:
                    writer = pq.ParquetWriter(
                        strip_scheme(output_path), table.schema,
                        filesystem=filesystem_for(output_path),
                    )
                else:
                    table = table.cast(writer.schema)
                writer.write_table(table)
                rows_written += len(df)
                if verbose:
                    print(f"Processed batch {idx + 1}, "
                          f"rows written: {rows_written}")
    except BaseException:
        # Close the writer and remove the partial output: a half-written
        # parquet with a valid footer would silently pass as a dataset.
        if writer is not None:
            try:
                writer.close()
            except Exception:
                pass
            try:
                filesystem_for(output_path).delete_file(
                    strip_scheme(output_path)
                )
            except Exception:
                pass
        raise
    if writer is None:
        raise ValueError("No rows were read from input paths.")
    writer.close()
    if verbose:
        print(f"Saved preprocessed parquet to {output_path}")
    return rows_written


def _split_task(kwargs: dict) -> int:
    """Picklable per-split worker for process-parallel preprocessing.

    Runs in a spawn-context child: the whole jax platform is pinned to CPU
    before first use — children must never even initialize the TPU client
    (a second process blocks on the device and can wedge the tunnel)."""
    jax.config.update("jax_platforms", "cpu")
    return preprocess_parquet(backend="cpu", **kwargs)


def preprocess_splits(
    train_inputs,
    val_inputs,
    test_inputs,
    train_output: str,
    val_output: str,
    test_output: str,
    cfg: Optional[SpectrogramConfig] = None,
    normalize: bool = True,
    stats_output_path: Optional[str] = None,
    keep_trace: bool = True,
    batch_size: int = 2048,
    verbose: bool = True,
    backend: Optional[str] = None,
    workers: int = 1,
) -> Optional[dict]:
    """Full two-pass pipeline over the three splits
    (reference `preprocess_splits_to_gcs`, `preprocess_to_gcs.py:230-303`).

    workers > 1 reproduces the reference's 3-process split parallelism
    (spawn context, `preprocess_to_gcs.py:291-303`) for the CPU backend —
    useful when the host has cores to spare and the fused op runs on CPU.
    With a TPU device the emit pass stays sequential in-process (one TPU
    process at a time); a single device saturates on this workload anyway.
    """
    cfg = cfg or SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)
    stats = None
    if normalize:
        if verbose:
            print("Computing normalization stats from training data...")
        stats = compute_spectrogram_stats(train_inputs, cfg, batch_size, backend)
        if verbose:
            print(f"Stats ready. Mean={stats['mean']:.4f} Std={stats['std']:.4f}")
        if stats_output_path:
            write_json(stats_output_path, stats)
    split_jobs = [
        dict(
            input_paths=inputs, output_path=output, cfg=cfg,
            normalize_stats=stats, keep_trace=keep_trace,
            batch_size=batch_size, verbose=verbose,
        )
        for inputs, output in (
            (train_inputs, train_output),
            (val_inputs, val_output),
            (test_inputs, test_output),
        )
    ]
    if workers > 1 and backend == "cpu":
        from concurrent.futures import ProcessPoolExecutor
        from multiprocessing import get_context

        with ProcessPoolExecutor(
            max_workers=min(workers, 3), mp_context=get_context("spawn")
        ) as pool:
            list(pool.map(_split_task, split_jobs))
    else:
        for name, job in zip(("train", "val", "test"), split_jobs):
            if verbose:
                print(f"Processing {name} split...")
            preprocess_parquet(backend=backend, **job)
    return stats


def main():  # pragma: no cover — CLI entry (reference preprocess_to_gcs main)
    import argparse

    ap = argparse.ArgumentParser(
        description="Two-pass spectrogram preprocessing: raw trial parquet → "
                    "normalized log-spectrogram parquet."
    )
    bucket, prefix = "lfp_spec_datasets", "neural/v2"
    ap.add_argument("--train_input", default=f"gs://{bucket}/{prefix}/train.parquet")
    ap.add_argument("--val_input", default=f"gs://{bucket}/{prefix}/val.parquet")
    ap.add_argument("--test_input", default=f"gs://{bucket}/{prefix}/test.parquet")
    ap.add_argument("--train_output",
                    default=f"gs://{bucket}/{prefix}/train_preprocessed.parquet")
    ap.add_argument("--val_output",
                    default=f"gs://{bucket}/{prefix}/val_preprocessed.parquet")
    ap.add_argument("--test_output",
                    default=f"gs://{bucket}/{prefix}/test_preprocessed.parquet")
    ap.add_argument("--stats_output",
                    default=f"gs://{bucket}/{prefix}/spectrogram_norm_stats.json")
    ap.add_argument("--nperseg", type=int, default=126)
    ap.add_argument("--noverlap", type=int, default=116)
    ap.add_argument("--fs", type=int, default=1000)
    ap.add_argument("--freq_max", type=float, default=None)
    ap.add_argument("--end_time", type=float, default=5.0)
    ap.add_argument("--baseline_end", type=float, default=2.0)
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--no_normalize", action="store_true")
    ap.add_argument("--drop_trace", action="store_true")
    ap.add_argument("--backend", default=None,
                    help="force the fused op onto a backend (e.g. 'cpu')")
    ap.add_argument("--workers", type=int, default=1,
                    help="process-parallel split emit (cpu backend only; "
                         "reference preprocess_to_gcs.py:291-303)")
    args = ap.parse_args()

    cfg = SpectrogramConfig(
        fs=args.fs, nperseg=args.nperseg, noverlap=args.noverlap,
        freq_max=args.freq_max, end_time=args.end_time,
        baseline_end=args.baseline_end,
    )
    preprocess_splits(
        args.train_input, args.val_input, args.test_input,
        args.train_output, args.val_output, args.test_output,
        cfg=cfg, normalize=not args.no_normalize,
        stats_output_path=args.stats_output,
        keep_trace=not args.drop_trace,
        batch_size=args.batch_size, backend=args.backend,
        workers=args.workers,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
