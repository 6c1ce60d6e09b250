"""TPU input pipeline: parquet spectrogram splits → sharded device batches.

Replaces the reference's torch `ParquetSequenceDataset` + `DataLoader`
(`data/data_loader.py:80-243`) with a TPU-shaped design:

  * the split's spectrograms load once into a single dense
    (n_rows, F, T) float32 array (the reference also holds everything in
    host RAM — `data_loader.py:116-118` — but as 77k separate ndarrays);
  * sequences are a (n_seq, K) int32 gather index (`sequences.py`);
  * **device-resident mode**: the dense array is pushed to HBM once and each
    batch is a jitted `take` gather — zero per-step host→device traffic;
  * host mode: one contiguous numpy gather per batch, then `device_put`
    with an explicit batch sharding for data-parallel meshes;
  * epochs are reshuffled host-side from a seeded PRNG; the final partial
    batch is padded to full shape (jit-stable shapes) and carries a
    validity mask that metric accumulation respects.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_vit_tpu.data.parquet_io import open_dataset
from neural_vit_tpu.data.sequences import SequenceIndex, build_sequence_index

REQUIRED_COLUMNS = ("session", "condition", "trial_num")


@dataclass
class DataLoaderConfig:
    """Loader knobs (reference `data_loader.py:12-20`; worker/pinning fields
    are obsolete on TPU — batches are device-resident or one gather away).

    streaming=True swaps the load-everything dataset for
    `StreamingSpectrogramDataset`: a bounded LRU cache of decoded parquet
    row-chunks (≤ max_cached_rows rows in host RAM, nothing replicated to
    HBM) plus a one-batch-ahead host prefetch thread. Shuffling semantics
    are IDENTICAL to the in-memory loader (same seeded global permutation of
    the sequence index), so the two modes produce bit-identical batch
    streams."""

    batch_size: int = 16
    drop_last: bool = False
    shuffle_train: bool = True
    seed: int = 0
    device_resident: bool = True
    streaming: bool = False
    chunk_rows: int = 2048
    max_cached_rows: int = 16384
    prefetch: bool = True
    # (patch_trial, patch_freq, patch_time) switches device-resident batches
    # to the PRE-TILED patch layout (B, K/pk, F', T', pk·pf·pt): spectrogram
    # rows are tiled/paired ONCE at load (bf16, halving HBM residency) and
    # the model's per-step 7-D patchify transpose disappears — the patch
    # embed becomes reshape + matmul. Must match the model config's patch
    # dims; logits are bit-identical to the volume layout (the model casts
    # to bf16 before its transpose anyway). Device-resident mode only.
    tile_patches: Optional[Tuple[int, int, int]] = None
    # Storage dtype of the tiles — match the model's compute_dtype for
    # bit-identical logits (bf16 also halves HBM residency; set "float32"
    # for f32-compute models).
    tile_dtype: str = "bfloat16"
    # Path to a .npz with an int array `orders` of shape (epochs, n_seq):
    # the train iterator replays row e as epoch e's exact sample order
    # instead of drawing its own shuffle. Cross-implementation A/B tool —
    # the paired parity experiment records the torch DataLoader's realized
    # sample order and replays it here so both arms consume identical
    # batches. Shuffled (train) iterators only; an epoch beyond the
    # schedule is an error, never a silent fallback to fresh shuffling.
    order_schedule_path: Optional[str] = None


def _cell_to_array(cell) -> np.ndarray:
    """One parquet list<list<float>> cell → float32 ndarray."""
    return np.asarray(
        cell if not isinstance(cell, np.ndarray) or cell.dtype != object
        else cell.tolist(),
        dtype=np.float32,
    )


class SpectrogramDataset:
    """A split's spectrograms as one dense array + window index."""

    def __init__(
        self,
        specs: np.ndarray,          # (n_rows, F, T) float32
        index: SequenceIndex,
    ):
        self.specs = specs
        self.index = index
        self._device_specs = None
        self._pair_view = None      # ((pk, pf, pt), tiles, pair_index)
        self._device_tiles = None

    # -- construction -------------------------------------------------------
    @classmethod
    def from_parquet(
        cls,
        paths,
        *,
        n_trials: int,
        stride: int,
        spectrogram_column: str = "spectrogram",
        label_map: Optional[Dict[str, int]] = None,
    ) -> "SpectrogramDataset":
        if not spectrogram_column:
            raise ValueError(
                "spectrogram_column must be provided for preprocessed datasets."
            )
        dataset = open_dataset(paths)
        if spectrogram_column not in set(dataset.schema.names):
            raise ValueError("Preprocessed parquet is missing the spectrogram column.")
        table = dataset.to_table(
            columns=[*REQUIRED_COLUMNS, spectrogram_column]
        )
        df = table.to_pandas().reset_index(drop=True)
        cells = df[spectrogram_column].tolist()
        df = df.drop(columns=[spectrogram_column])

        shape = None
        for c in cells:
            arr = _cell_to_array(c)
            if arr.size:
                shape = arr.shape
                break
        if shape is None:
            raise ValueError("All spectrograms are empty.")
        specs = np.zeros((len(cells),) + shape, np.float32)
        valid = np.zeros(len(cells), bool)
        for i, c in enumerate(cells):
            arr = _cell_to_array(c)
            if arr.shape == shape:
                specs[i] = arr
                valid[i] = True
        index = build_sequence_index(
            df, n_trials=n_trials, stride=stride,
            label_map=label_map, valid_rows=valid,
        )
        return cls(specs, index)

    @classmethod
    def from_arrays(
        cls, specs: np.ndarray, df, *, n_trials: int, stride: int,
        label_map=None, valid_rows=None,
    ) -> "SpectrogramDataset":
        index = build_sequence_index(
            df, n_trials=n_trials, stride=stride,
            label_map=label_map, valid_rows=valid_rows,
        )
        return cls(np.asarray(specs, np.float32), index)

    # -- introspection ------------------------------------------------------
    def __len__(self) -> int:
        return len(self.index)

    @property
    def freq_size(self) -> int:
        return self.specs.shape[1]

    @property
    def time_size(self) -> int:
        return self.specs.shape[2]

    @property
    def n_trials(self) -> int:
        return self.index.indices.shape[1]

    @property
    def labels(self) -> np.ndarray:
        return self.index.labels

    def sequence(self, i: int) -> Tuple[np.ndarray, int]:
        """(K, F, T) volume + label — torch __getitem__ analogue."""
        return self.specs[self.index.indices[i]], int(self.index.labels[i])

    def gather_rows(self, rows: np.ndarray) -> np.ndarray:
        """Rows of the dense spectrogram array (any shape of `rows`)."""
        return self.specs[rows]

    # -- pre-tiled patch storage ---------------------------------------------
    def pair_tile_view(
        self, patch_trial: int, patch_freq: int, patch_time: int,
        dtype: str = "bfloat16",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(tiles, window_index) for the pre-tiled patch layout.

        Each spectrogram row is tiled once into (F', T', pf·pt) blocks, and
        the window index's consecutive `patch_trial`-groups of rows become
        rows of a deduplicated tile array (bf16) whose last axis is the full
        patch vector in the model's (pk, pf, pt) element order. Batches
        gathered with `window_index` are (B, K/pk, F', T', pk·pf·pt) — the
        model consumes them with ZERO per-step patchify transpose.

        Tile rows are deduplicated across windows: with the default
        stride=4 / pk=2 every window shares its trial pairs with its
        overlapping neighbours, so the tile array holds each pair once
        (≈ the same bytes as the f32 volume array, halved by bf16)."""
        import ml_dtypes

        np_dtype = (
            ml_dtypes.bfloat16 if dtype == "bfloat16" else np.dtype(dtype)
        )
        key = (patch_trial, patch_freq, patch_time, dtype)
        if self._pair_view is not None and self._pair_view[0] == key:
            return self._pair_view[1], self._pair_view[2]
        pk, pf, pt = patch_trial, patch_freq, patch_time
        n, f, t = self.specs.shape
        if f % pf or t % pt:
            raise ValueError(f"({f}, {t}) not divisible by patches ({pf}, {pt})")
        k = self.index.indices.shape[1]
        if k % pk:
            raise ValueError(f"n_trials {k} not divisible by patch_trial {pk}")
        gf, gt = f // pf, t // pt

        groups = self.index.indices.reshape(-1, pk)        # (n_seq·K/pk, pk)
        pairs, inverse = np.unique(groups, axis=0, return_inverse=True)
        window_index = inverse.reshape(-1, k // pk).astype(np.int32)

        tiles_per_row = (
            self.specs.reshape(n, gf, pf, gt, pt)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, gf, gt, pf * pt)
            .astype(np_dtype)
        )
        # (n_pairs, gf, gt, pk·pf·pt), patch-vector order (pk, pf, pt).
        tiles = np.concatenate(
            [tiles_per_row[pairs[:, i]] for i in range(pk)], axis=-1
        )
        self._pair_view = (key, tiles, window_index)
        return tiles, window_index

    # -- device residency ---------------------------------------------------
    def to_device(self, sharding=None, tile_patches=None,
                  tile_dtype: str = "bfloat16") -> jax.Array:
        if tile_patches is not None:
            if self._device_tiles is None:
                tiles, _ = self.pair_tile_view(*tile_patches, dtype=tile_dtype)
                self._device_tiles = (
                    jax.device_put(tiles, sharding)
                    if sharding is not None else jnp.asarray(tiles)
                )
            return self._device_tiles
        if self._device_specs is None:
            self._device_specs = (
                jax.device_put(self.specs, sharding)
                if sharding is not None else jnp.asarray(self.specs)
            )
        return self._device_specs


class StreamingSpectrogramDataset:
    """A split too large for residency: sequence index in RAM, spectrograms
    decoded on demand from parquet in fixed row-chunks behind a bounded LRU
    cache (SURVEY hard-part #5 — replaces the reference's load-everything
    pattern, `data_loader.py:116-118`).

    Construction streams the file once (arrow record batches) to collect
    the window metadata and per-row validity, retaining no pixel data. At
    iteration time a batch gathers its rows from the cache; a miss decodes
    one `chunk_rows`-row chunk via `Dataset.take`. Host RSS is bounded by
    `max_cached_rows` decoded rows; nothing is replicated into HBM (batches
    stream through `device_put`, double-buffered by the iterator's prefetch
    thread)."""

    def __init__(
        self,
        paths,
        *,
        n_trials: int,
        stride: int,
        spectrogram_column: str = "spectrogram",
        label_map: Optional[Dict[str, int]] = None,
        chunk_rows: int = 2048,
        max_cached_rows: int = 16384,
    ):
        from collections import OrderedDict

        if not spectrogram_column:
            raise ValueError(
                "spectrogram_column must be provided for preprocessed datasets."
            )
        self._dataset = open_dataset(paths)
        if spectrogram_column not in set(self._dataset.schema.names):
            raise ValueError("Preprocessed parquet is missing the spectrogram column.")
        self._column = spectrogram_column
        self._chunk_rows = int(chunk_rows)
        self._max_cached_rows = max(int(max_cached_rows), self._chunk_rows)
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()

        # One metadata pass: window columns + validity/shape, no retention.
        import pandas as pd

        frames, valids = [], []
        shape = None
        scanner = self._dataset.scanner(
            columns=[*REQUIRED_COLUMNS, spectrogram_column],
            batch_size=self._chunk_rows,
        )
        for batch in scanner.to_batches():
            df = batch.to_pandas()
            cells = df[spectrogram_column].tolist()
            frames.append(df.drop(columns=[spectrogram_column]))
            v = np.zeros(len(cells), bool)
            for i, c in enumerate(cells):
                arr = _cell_to_array(c)
                if shape is None and arr.size:
                    shape = arr.shape
                v[i] = arr.size > 0 and arr.shape == shape
            valids.append(v)
        if shape is None:
            raise ValueError("All spectrograms are empty.")
        self._shape = shape
        meta = pd.concat(frames).reset_index(drop=True)
        valid = np.concatenate(valids)
        self._n_rows = len(meta)
        self.index = build_sequence_index(
            meta, n_trials=n_trials, stride=stride,
            label_map=label_map, valid_rows=valid,
        )

    # -- introspection (same surface as SpectrogramDataset) -----------------
    def __len__(self) -> int:
        return len(self.index)

    @property
    def freq_size(self) -> int:
        return self._shape[0]

    @property
    def time_size(self) -> int:
        return self._shape[1]

    @property
    def n_trials(self) -> int:
        return self.index.indices.shape[1]

    @property
    def labels(self) -> np.ndarray:
        return self.index.labels

    def sequence(self, i: int) -> Tuple[np.ndarray, int]:
        return (
            self.gather_rows(self.index.indices[i]),
            int(self.index.labels[i]),
        )

    # -- chunk cache ---------------------------------------------------------
    def _chunk(self, cid: int) -> np.ndarray:
        cached = self._cache.get(cid)
        if cached is not None:
            self._cache.move_to_end(cid)
            return cached
        lo = cid * self._chunk_rows
        hi = min(lo + self._chunk_rows, self._n_rows)
        table = self._dataset.take(
            np.arange(lo, hi), columns=[self._column]
        )
        cells = table.column(0).to_pylist()
        dense = np.zeros((hi - lo,) + self._shape, np.float32)
        for i, c in enumerate(cells):
            arr = _cell_to_array(c)
            if arr.shape == self._shape:
                dense[i] = arr
        self._cache[cid] = dense
        while len(self._cache) * self._chunk_rows > self._max_cached_rows:
            self._cache.popitem(last=False)
        return dense

    def gather_rows(self, rows: np.ndarray) -> np.ndarray:
        rows = np.asarray(rows)
        flat = rows.reshape(-1)
        out = np.empty((flat.size,) + self._shape, np.float32)
        cids = flat // self._chunk_rows
        for cid in np.unique(cids):
            sel = cids == cid
            chunk = self._chunk(int(cid))
            out[sel] = chunk[flat[sel] - int(cid) * self._chunk_rows]
        return out.reshape(rows.shape + self._shape)


def _pad_batch(idx: np.ndarray, labels: np.ndarray, batch_size: int):
    n = idx.shape[0]
    mask = np.zeros(batch_size, bool)
    mask[:n] = True
    if n < batch_size:
        pad = batch_size - n
        idx = np.concatenate([idx, np.repeat(idx[-1:], pad, axis=0)])
        labels = np.concatenate([labels, np.repeat(labels[-1:], pad)])
    return idx, labels, mask


class BatchIterator:
    """Epoch iterator yielding (volumes, labels (B,), valid (B,)).

    Volumes are (B, K, F, T), or (B, K/pk, F', T', pk·pf·pt) pre-tiled
    patches when `cfg.tile_patches` is set (device-resident only — the
    model consumes either layout). In device-resident mode the gather runs
    jitted on device; otherwise a contiguous host gather feeds `device_put`
    (with `batch_sharding` when training data-parallel).
    """

    def __init__(
        self,
        dataset,
        cfg: DataLoaderConfig,
        *,
        shuffle: bool,
        batch_sharding=None,
    ):
        self.ds = dataset
        self.cfg = cfg
        self.shuffle = shuffle
        self.batch_sharding = batch_sharding
        self._epoch = 0
        self._skip_next = 0
        # Multi-process (multi-host slice): no process can device_put the
        # full global batch — each host feeds only the rows its
        # addressable devices own and the batch is stitched into one
        # global jax.Array (parallel/multihost.py). Host mode only: the
        # device-resident replicated spec array would equally need every
        # process to address every device.
        self._multiprocess = (
            batch_sharding is not None and jax.process_count() > 1
        )
        if self._multiprocess:
            import dataclasses as _dc

            from neural_vit_tpu.parallel.multihost import local_batch_rows

            cfg = _dc.replace(cfg, device_resident=False)
            self._local_rows = local_batch_rows(
                batch_sharding, cfg.batch_size
            )
            self.cfg = cfg
        self._order_schedule = None
        if shuffle and cfg.order_schedule_path:
            self._order_schedule = np.load(cfg.order_schedule_path)["orders"]
            if self._order_schedule.ndim != 2 or (
                self._order_schedule.shape[1] != len(dataset)
            ):
                raise ValueError(
                    f"order schedule {self._order_schedule.shape} does not "
                    f"match the dataset ({len(dataset)} sequences)"
                )
        self._device_resident = (
            cfg.device_resident and hasattr(dataset, "to_device")
        )
        self._window_indices = dataset.index.indices
        tile = cfg.tile_patches
        if tile is not None:
            if not (self._device_resident and hasattr(dataset, "pair_tile_view")):
                raise ValueError(
                    "tile_patches requires a device-resident SpectrogramDataset"
                    " (streaming/host modes keep the volume layout)"
                )
            _, self._window_indices = self.ds.pair_tile_view(
                *tile, dtype=cfg.tile_dtype
            )
        if self._device_resident:
            # Replicate the dense spectrogram array across the mesh once;
            # each batch gather lands already sharded over the data axis.
            # The spec array is a jit ARGUMENT, never a closure capture — a
            # captured array becomes a compile-time constant embedded in the
            # executable (gigabytes shipped to the compiler).
            take = lambda specs, idx: jnp.take(specs, idx, axis=0)
            if batch_sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(batch_sharding.mesh, PartitionSpec())
                specs = self.ds.to_device(
                    rep, tile_patches=tile, tile_dtype=cfg.tile_dtype
                )
                gather = jax.jit(take, out_shardings=batch_sharding)
            else:
                specs = self.ds.to_device(
                    tile_patches=tile, tile_dtype=cfg.tile_dtype
                )
                gather = jax.jit(take)
            self._gather = lambda idx: gather(specs, idx)

    def __len__(self) -> int:
        n = len(self.ds)
        b = self.cfg.batch_size
        return n // b if self.cfg.drop_last else -(-n // b)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch counter (0-based) so a resumed run replays
        the exact batch order of the uninterrupted run."""
        self._epoch = epoch

    def skip_next(self, n_batches: int) -> None:
        """Skip the first `n_batches` of the NEXT epoch iterated (one-shot).
        Mid-epoch preemption resume: the shuffle order is a pure function
        of (seed, epoch), so dropping the batches already consumed before
        the checkpoint replays the interrupted epoch step-exactly."""
        self._skip_next = int(n_batches)

    def _host_batch(self, sel: np.ndarray):
        """Assemble one padded host batch (CPU-side work only — safe to run
        on the prefetch thread)."""
        idx = self._window_indices[sel]
        labels = self.ds.index.labels[sel]
        idx, labels, mask = _pad_batch(idx, labels, self.cfg.batch_size)
        if self._multiprocess:
            # Decode/gather ONLY the rows this process's devices own.
            return idx, labels, mask, self.ds.gather_rows(
                idx[self._local_rows]
            )
        if self._device_resident:
            return idx, labels, mask, None
        return idx, labels, mask, self.ds.gather_rows(idx)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self._order_schedule is not None:
            if self._epoch >= self._order_schedule.shape[0]:
                raise ValueError(
                    f"epoch {self._epoch} beyond the recorded order "
                    f"schedule ({self._order_schedule.shape[0]} epochs)"
                )
            order = self._order_schedule[self._epoch].astype(np.int64)
        elif self.shuffle:
            rng = np.random.default_rng(self.cfg.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        b = self.cfg.batch_size
        stop = (n // b) * b if self.cfg.drop_last else n
        starts = list(range(0, stop, b))
        if self._skip_next:
            starts = starts[self._skip_next:]
            self._skip_next = 0

        def emit(prepared):
            idx, labels, mask, host_vol = prepared
            if self._multiprocess:
                from neural_vit_tpu.parallel.multihost import (
                    global_from_local,
                )

                lr = self._local_rows
                vol = global_from_local(self.batch_sharding, host_vol)
                lab = global_from_local(self.batch_sharding, labels[lr])
                msk = global_from_local(
                    self.batch_sharding, mask[lr].astype(np.float32)
                )
                return vol, lab, msk
            if self._device_resident:
                vol = self._gather(jnp.asarray(idx))
            else:
                vol = jax.device_put(host_vol, self.batch_sharding)
            return vol, jnp.asarray(labels), mask

        if not self.cfg.prefetch or self._device_resident:
            for start in starts:
                yield emit(self._host_batch(order[start:start + b]))
            return

        # Double buffering: the next batch's host gather/decode overlaps the
        # device step running on the current one.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = None
            for start in starts:
                nxt = pool.submit(self._host_batch, order[start:start + b])
                if fut is not None:
                    yield emit(fut.result())
                fut = nxt
            if fut is not None:
                yield emit(fut.result())


def build_dataloaders(
    train_paths: List[str],
    val_paths: List[str],
    test_paths: List[str],
    *,
    n_trials: int,
    stride: int,
    spectrogram_column: str = "spectrogram",
    loader_cfg: Optional[DataLoaderConfig] = None,
    label_map: Optional[Dict[str, int]] = None,
    batch_sharding=None,
):
    """Three-split loader construction (reference
    `build_parquet_dataloaders`, `data_loader.py:200-243`).

    Returns (train_iter, val_iter, test_iter, (train_ds, val_ds, test_ds)).
    """
    loader_cfg = loader_cfg or DataLoaderConfig()
    if loader_cfg.streaming:
        datasets = tuple(
            StreamingSpectrogramDataset(
                p, n_trials=n_trials, stride=stride,
                spectrogram_column=spectrogram_column, label_map=label_map,
                chunk_rows=loader_cfg.chunk_rows,
                max_cached_rows=loader_cfg.max_cached_rows,
            )
            for p in (train_paths, val_paths, test_paths)
        )
    else:
        datasets = tuple(
            SpectrogramDataset.from_parquet(
                p, n_trials=n_trials, stride=stride,
                spectrogram_column=spectrogram_column, label_map=label_map,
            )
            for p in (train_paths, val_paths, test_paths)
        )
    train_it = BatchIterator(
        datasets[0], loader_cfg, shuffle=loader_cfg.shuffle_train,
        batch_sharding=batch_sharding,
    )
    val_it = BatchIterator(
        datasets[1], loader_cfg, shuffle=False, batch_sharding=batch_sharding
    )
    test_it = BatchIterator(
        datasets[2], loader_cfg, shuffle=False, batch_sharding=batch_sharding
    )
    return train_it, val_it, test_it, datasets
