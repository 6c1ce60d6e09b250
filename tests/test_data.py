"""Data layer: splits (determinism, disjointness, reference parity),
sequence windowing semantics, and the end-to-end parquet pipeline
(the reference's `local_tests/test_pipeline.py` gates, as real asserts)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest
from scipy.signal import spectrogram as scipy_spectrogram
from scipy.signal import windows

from neural_vit_tpu.data.loader import (
    BatchIterator,
    DataLoaderConfig,
    SpectrogramDataset,
    build_dataloaders,
)
from neural_vit_tpu.data.pipeline import (
    preprocess_splits,
)
from neural_vit_tpu.data.sequences import (
    build_sequence_index,
    label_counts,
    parse_trace,
    sequence_feature,
    stack_traces,
)
from neural_vit_tpu.data.splits import (
    create_kfold_splits,
    create_session_splits_df,
    stratified_group_split,
)
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
from neural_vit_tpu.ops.spectrogram import SpectrogramConfig

SPEC_CFG = SpectrogramConfig(fs=1000, nperseg=126, noverlap=116)


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------

def _frame(n_sessions=10, trials=12, seed=0):
    return synthetic_lfp_frame(n_sessions, trials, trace_len=5200, seed=seed)


def test_split_determinism_and_disjointness():
    df = _frame()
    a = create_session_splits_df(df, 0.2, 0.2)
    b = create_session_splits_df(df, 0.2, 0.2)
    for x, y in zip(a, b):
        assert set(x["session"]) == set(y["session"])
    train, val, test = a
    assert set(train.session).isdisjoint(set(val.session))
    assert set(train.session).isdisjoint(set(test.session))
    assert set(val.session).isdisjoint(set(test.session))
    assert len(train) + len(val) + len(test) == len(df)


def test_split_requires_enough_groups():
    df = _frame(n_sessions=1)
    with pytest.raises(ValueError):
        stratified_group_split(df.condition.values, df.session.values, 0.2)


def test_kfold_session_level():
    df = _frame()
    seqs = [
        {"session": s, "label": int(c == "FMR1")}
        for s, c in zip(df.session, df.condition)
    ]
    folds = create_kfold_splits(seqs, n_splits=3)
    assert len(folds) == 3
    for tr, te in folds:
        assert {x["session"] for x in tr}.isdisjoint({x["session"] for x in te})


_REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, "temporal_vit")),
    reason="reference checkout not available",
)
def test_split_parity_with_reference():
    """Identical session assignment as the reference implementation —
    required so baseline/eval comparisons run on the same data."""
    sys.path.insert(0, _REF)
    try:
        from temporal_vit.data.session_splits import (
            create_session_splits_df as ref_split,
        )
    finally:
        sys.path.remove(_REF)
    df = _frame(n_sessions=12, trials=6)
    ours = create_session_splits_df(df, 0.15, 0.15)
    theirs = ref_split(df, 0.15, 0.15)
    for o, t in zip(ours, theirs):
        assert list(o.session) == list(t.session)
        assert list(o.trial_num) == list(t.trial_num)


# ---------------------------------------------------------------------------
# sequences
# ---------------------------------------------------------------------------

def test_sequence_windowing_semantics():
    df = pd.DataFrame(
        {
            "session": ["a"] * 10 + ["b"] * 3 + ["c"] * 8,
            "condition": ["FMR1"] * 10 + ["WT"] * 3 + ["WT"] * 8,
            "trial_num": list(range(10)) + list(range(3)) + list(range(8)),
        }
    )
    idx = build_sequence_index(df, n_trials=4, stride=2)
    # session a: starts 0,2,4,6 → 4 windows; b: too short; c: starts 0,2,4 → 3.
    assert len(idx) == 7
    assert (idx.labels[:4] == 1).all() and (idx.labels[4:] == 0).all()
    # windows are consecutive sorted trials
    first = idx.indices[0]
    assert list(df.trial_num.iloc[first]) == [0, 1, 2, 3]


def test_sequence_mixed_condition_raises():
    df = pd.DataFrame(
        {
            "session": ["a"] * 4,
            "condition": ["FMR1", "FMR1", "WT", "FMR1"],
            "trial_num": range(4),
        }
    )
    with pytest.raises(ValueError, match="mixed conditions"):
        build_sequence_index(df, n_trials=2, stride=1)


def test_sequence_skips_invalid_rows():
    df = pd.DataFrame(
        {"session": ["a"] * 6, "condition": ["WT"] * 6, "trial_num": range(6)}
    )
    valid = np.array([True, True, False, True, True, True])
    idx = build_sequence_index(df, n_trials=2, stride=2, valid_rows=valid)
    # windows (0,1), (2,3)✗, (4,5) → 2 windows
    assert len(idx) == 2


def test_sequence_unsorted_trials_are_sorted():
    df = pd.DataFrame(
        {
            "session": ["a"] * 4,
            "condition": ["WT"] * 4,
            "trial_num": [3, 1, 0, 2],
        }
    )
    idx = build_sequence_index(df, n_trials=4, stride=1)
    assert list(df.trial_num.iloc[idx.indices[0]]) == [0, 1, 2, 3]


def test_parse_trace_forms():
    arr = np.array([1.0, 2.5, -3.0])
    np.testing.assert_allclose(parse_trace(arr), arr)
    np.testing.assert_allclose(parse_trace(list(arr)), arr)
    np.testing.assert_allclose(parse_trace("[1.0, 2.5, -3.0]"), arr)
    np.testing.assert_allclose(parse_trace("1.0 2.5 -3.0"), arr)
    assert parse_trace("[]").size == 0


def test_stack_traces_pads_and_flags():
    dense, valid = stack_traces(
        [np.ones(100), np.ones(50), np.ones(120)], expected_len=100
    )
    assert dense.shape == (3, 100)
    assert list(valid) == [True, False, True]


def test_label_counts_and_features():
    assert list(label_counts([0, 1, 1, 1])) == [1, 3]
    specs = np.random.default_rng(0).standard_normal((4, 8, 16)).astype(np.float32)
    f1 = sequence_feature(specs, "trial_stats")
    assert f1.shape == (2 * 8 * 16,)
    f2 = sequence_feature(specs, "trial_time_stats")
    assert f2.shape == (2 * 8,)
    np.testing.assert_allclose(f1[: 8 * 16], specs.mean(0).ravel(), rtol=1e-5)


# ---------------------------------------------------------------------------
# end-to-end parquet pipeline (reference local_tests/test_pipeline.py gates)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline")
    df = synthetic_lfp_frame(
        n_sessions=8, trials_per_session=10, trace_len=5300, seed=1,
        as_string=False,
    )
    train_df, val_df, test_df = create_session_splits_df(df, 0.25, 0.25)
    raw = {}
    for name, d in (("train", train_df), ("val", val_df), ("test", test_df)):
        p = str(tmp / f"{name}.parquet")
        d.to_parquet(p)
        raw[name] = p
    out = {n: str(tmp / f"{n}_pre.parquet") for n in ("train", "val", "test")}
    stats = preprocess_splits(
        raw["train"], raw["val"], raw["test"],
        out["train"], out["val"], out["test"],
        cfg=SPEC_CFG, stats_output_path=str(tmp / "stats.json"),
        batch_size=64, verbose=False,
    )
    return raw, out, stats, df


def test_pipeline_stats_normalize_train_split(pipeline_dirs):
    raw, out, stats, _ = pipeline_dirs
    assert stats["count"] > 0 and stats["std"] > 0
    ds = SpectrogramDataset.from_parquet(
        [out["train"]], n_trials=4, stride=2
    )
    # Train split is z-normalized with its own stats ⇒ ~0 mean, ~1 std.
    assert abs(ds.specs.mean()) < 0.05
    assert abs(ds.specs.std() - 1.0) < 0.05


def test_pipeline_spectrogram_matches_scipy_row(pipeline_dirs):
    raw, out, stats, _ = pipeline_dirs
    raw_df = pd.read_parquet(raw["val"])
    pre_df = pd.read_parquet(out["val"])
    trace = np.asarray(raw_df.iloc[0].trace, np.float64)[:5000]
    trace = trace - trace[:2000].mean()
    win = windows.hann(126)
    _, _, sxx = scipy_spectrogram(
        trace, fs=1000, window=win, nperseg=126, noverlap=116,
        scaling="density",
    )
    ref = (np.log10(sxx + 1e-10) - stats["mean"]) / (stats["std"] + 1e-8)
    got = np.asarray(pre_df.iloc[0].spectrogram.tolist(), np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_process_parallel_preprocess_matches_sequential(pipeline_dirs, tmp_path):
    """workers=2 (spawn-process split emit, reference
    preprocess_to_gcs.py:291-303) must write byte-identical spectrogram
    columns to the sequential path."""
    import pyarrow.parquet as pq

    raw, out, _, _ = pipeline_dirs
    par = {n: str(tmp_path / f"{n}_par.parquet") for n in ("train", "val", "test")}
    preprocess_splits(
        raw["train"], raw["val"], raw["test"],
        par["train"], par["val"], par["test"],
        cfg=SPEC_CFG, stats_output_path=str(tmp_path / "stats.json"),
        batch_size=64, verbose=False, backend="cpu", workers=2,
    )
    for name in ("train", "val", "test"):
        a = pq.read_table(out[name], columns=["spectrogram"])
        b = pq.read_table(par[name], columns=["spectrogram"])
        # allclose, not equals: the CPU conv backend (oneDNN) is not
        # bitwise-deterministic across processes.
        av = np.asarray(a.column(0).to_pylist(), dtype=object)
        bv = np.asarray(b.column(0).to_pylist(), dtype=object)
        assert len(av) == len(bv)
        for x, y in zip(av, bv):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=1e-4, atol=1e-4,
            )


def test_streaming_loader_matches_in_memory(pipeline_dirs):
    """The streaming dataset (bounded LRU chunk cache, nothing fully
    resident) must produce bit-identical batch streams to the in-memory
    loader — same window index, same seeded shuffle, same padding."""
    from neural_vit_tpu.data.loader import (
        BatchIterator,
        DataLoaderConfig,
        SpectrogramDataset,
        StreamingSpectrogramDataset,
    )

    _, out, _, _ = pipeline_dirs
    mem = SpectrogramDataset.from_parquet([out["train"]], n_trials=4, stride=2)
    # Tiny chunk/cache sizes force decode misses and LRU eviction.
    stream = StreamingSpectrogramDataset(
        [out["train"]], n_trials=4, stride=2, chunk_rows=8, max_cached_rows=16,
    )
    assert len(stream) == len(mem)
    assert (stream.freq_size, stream.time_size) == (mem.freq_size, mem.time_size)
    np.testing.assert_array_equal(stream.index.indices, mem.index.indices)
    np.testing.assert_array_equal(stream.labels, mem.labels)

    cfg_mem = DataLoaderConfig(batch_size=8, device_resident=False,
                               shuffle_train=True, seed=3)
    cfg_stream = DataLoaderConfig(batch_size=8, device_resident=False,
                                  shuffle_train=True, seed=3, streaming=True,
                                  chunk_rows=8, max_cached_rows=16)
    it_mem = BatchIterator(mem, cfg_mem, shuffle=True)
    it_stream = BatchIterator(stream, cfg_stream, shuffle=True)
    for _ in range(2):  # two epochs: shuffle state advances identically
        for (v1, l1, m1), (v2, l2, m2) in zip(it_mem, it_stream):
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
            np.testing.assert_array_equal(m1, m2)


def test_keep_trace_start_time_window(pipeline_dirs, tmp_path):
    """Stored trace column with start_time > 0 must match the reference's
    `_preprocess_frame` (preprocess_to_gcs.py:44-52): baseline mean over the
    FULL trace's first `baseline_end` seconds, then crop
    [start_time*fs : end_time*fs]."""
    from neural_vit_tpu.data.pipeline import preprocess_parquet

    raw, _, _, _ = pipeline_dirs
    cfg = SpectrogramConfig(
        fs=1000, nperseg=126, noverlap=116, start_time=1.0, end_time=5.0,
    )
    out = str(tmp_path / "windowed.parquet")
    preprocess_parquet(raw["val"], out, cfg, batch_size=64, verbose=False)
    raw_df = pd.read_parquet(raw["val"])
    pre_df = pd.read_parquet(out)
    full = np.asarray(raw_df.iloc[0].trace, np.float32)
    expected = (full - full[:2000].mean())[1000:5000]
    got = np.asarray(pre_df.iloc[0].trace, np.float32)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_loaders_verify_gates(pipeline_dirs):
    """The reference's verify_dataloaders checks as asserts
    (`local_tests/test_pipeline.py:110-202`): loaders non-empty, 4-D float
    batches, finite values, binary labels."""
    _, out, _, _ = pipeline_dirs
    cfg = DataLoaderConfig(batch_size=8, device_resident=True)
    train_it, val_it, test_it, (train_ds, val_ds, test_ds) = build_dataloaders(
        [out["train"]], [out["val"]], [out["test"]],
        n_trials=4, stride=2, loader_cfg=cfg,
    )
    assert len(train_ds) > 0 and len(val_ds) > 0 and len(test_ds) > 0
    assert train_ds.freq_size == 64 and train_ds.time_size == 488
    seen = 0
    for vol, labels, mask in train_it:
        assert vol.shape == (8, 4, 64, 488)
        assert np.isfinite(np.asarray(vol)).all()
        lab = np.asarray(labels)[mask]
        assert set(np.unique(lab)).issubset({0, 1})
        seen += int(mask.sum())
    assert seen == len(train_ds)
    # shuffling differs between epochs, coverage identical
    e1 = [np.asarray(l)[m] for _, l, m in train_it]
    e2 = [np.asarray(l)[m] for _, l, m in train_it]
    assert sorted(np.concatenate(e1)) == sorted(np.concatenate(e2))


def test_order_schedule_replay(pipeline_dirs, tmp_path):
    """A recorded .npz order schedule is replayed verbatim per epoch (the
    paired parity experiment feeds the torch DataLoader's realized sample
    order through this), and running past the schedule is an error."""
    _, out, _, _ = pipeline_dirs
    ds = SpectrogramDataset.from_parquet([out["val"]], n_trials=4, stride=4)
    n = len(ds)
    rng = np.random.default_rng(7)
    orders = np.stack([rng.permutation(n) for _ in range(2)])
    path = tmp_path / "orders.npz"
    np.savez(path, orders=orders)
    it = BatchIterator(
        ds,
        DataLoaderConfig(batch_size=4, order_schedule_path=str(path)),
        shuffle=True,
    )
    for e in range(2):
        batches = list(it)
        labs = np.concatenate([np.asarray(l)[m] for _, l, m in batches])
        np.testing.assert_array_equal(labs, ds.index.labels[orders[e]])
        first_rows = ds.index.indices[orders[e][0]]
        np.testing.assert_allclose(
            np.asarray(batches[0][0])[0], ds.specs[first_rows]
        )
    with pytest.raises(ValueError, match="beyond the recorded order"):
        next(iter(it))


def test_host_mode_matches_device_mode(pipeline_dirs):
    _, out, _, _ = pipeline_dirs
    ds = SpectrogramDataset.from_parquet([out["val"]], n_trials=4, stride=4)
    it_dev = BatchIterator(ds, DataLoaderConfig(batch_size=4, device_resident=True), shuffle=False)
    it_host = BatchIterator(ds, DataLoaderConfig(batch_size=4, device_resident=False), shuffle=False)
    for (a, la, ma), (b, lb, mb) in zip(it_dev, it_host):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(ma, mb)


def test_pair_tiled_batches_match_volume_layout(pipeline_dirs):
    """tile_patches batches must carry exactly the volume batches' data in
    the model's (pk, pf, pt) patch-vector order, and the model must produce
    BIT-IDENTICAL logits from either layout (bf16 tiles + bf16 compute —
    the production configuration)."""
    import jax
    import jax.numpy as jnp

    from neural_vit_tpu.core.config import Temporal3DViTConfig
    from neural_vit_tpu.models.vit import Temporal3DViT

    _, out, _, _ = pipeline_dirs
    ds = SpectrogramDataset.from_parquet([out["val"]], n_trials=4, stride=2)
    it_vol = BatchIterator(
        ds, DataLoaderConfig(batch_size=4), shuffle=False
    )
    it_tile = BatchIterator(
        ds, DataLoaderConfig(batch_size=4, tile_patches=(2, 8, 8)),
        shuffle=False,
    )
    cfg = Temporal3DViTConfig(
        n_trials=4, freq_size=64, time_size=488, patch_trial=2, patch_freq=8,
        patch_time=8, embed_dim=64, n_heads=2, n_layers=2,
        compute_dtype="bfloat16", use_flash_attention=False,
    )
    model = Temporal3DViT(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 4, 64, 488))
    )["params"]
    checked = 0
    for (v, lv, mv), (t, lt, mt) in zip(it_vol, it_tile):
        assert t.shape == (4, 2, 8, 61, 128) and t.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(lv), np.asarray(lt))
        np.testing.assert_array_equal(mv, mt)
        # Layout equivalence: re-tile the volume batch by hand.
        want = (
            np.asarray(v)
            .reshape(4, 2, 2, 8, 8, 61, 8)
            .transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(4, 2, 8, 61, 128)
        )
        np.testing.assert_array_equal(
            np.asarray(t, np.float32),
            want.astype(jnp.bfloat16).astype(np.float32),
        )
        a = model.apply({"params": params}, v)
        b = model.apply({"params": params}, t)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        checked += 1
    assert checked == len(it_vol) == len(it_tile)


def test_tile_patches_rejects_non_resident_modes(pipeline_dirs):
    _, out, _, _ = pipeline_dirs
    ds = SpectrogramDataset.from_parquet([out["val"]], n_trials=4, stride=2)
    with pytest.raises(ValueError, match="device-resident"):
        BatchIterator(
            ds,
            DataLoaderConfig(tile_patches=(2, 8, 8), device_resident=False),
            shuffle=False,
        )


def test_sequence_getitem_matches_reference_semantics(pipeline_dirs):
    _, out, _, _ = pipeline_dirs
    ds = SpectrogramDataset.from_parquet([out["test"]], n_trials=4, stride=2)
    vol, label = ds.sequence(0)
    assert vol.shape == (4, 64, 488) and vol.dtype == np.float32
    assert label in (0, 1)
