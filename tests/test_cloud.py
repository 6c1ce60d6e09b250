"""Contract tests for the cloud layer against faked clients.

The real BigQuery/GCS services are unreachable here (the reference ran
these for real — `cloud/get_data.py:5-96`, `cloud/export_to_gcs.py:8-45`);
these tests pin the load-bearing behavior instead: the SQL text each query
builder emits (table interpolation, FARM_FINGERPRINT stratified-sampling
structure, the sampling fraction), and the export path's full contract
(query → seed-42 session splits → three parquets) with a stub client and a
local directory standing in for gs://.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow.parquet as pq
import pytest

from neural_vit_tpu.cloud.bigquery_io import (
    DEFAULT_TABLE,
    dataset_stats,
    get_stratified_sample,
)
from neural_vit_tpu.cloud.export import export_full_dataset_to_gcs
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame


class _FakeJob:
    def __init__(self, df: pd.DataFrame):
        self._df = df

    def to_dataframe(self) -> pd.DataFrame:
        return self._df


class _FakeClient:
    """Captures every SQL string and returns a canned frame."""

    def __init__(self, df: pd.DataFrame | None = None):
        self.queries: list[str] = []
        self._df = df if df is not None else pd.DataFrame()

    def query(self, sql: str) -> _FakeJob:
        self.queries.append(sql)
        return _FakeJob(self._df)


def test_dataset_stats_sql_contract():
    client = _FakeClient(pd.DataFrame({"total_trials": [7]}))
    out = dataset_stats(client, table="proj.ds.tbl")
    # Passthrough of the client's result frame.
    assert out["total_trials"].iloc[0] == 7
    (sql,) = client.queries
    # Table interpolation everywhere (no stray default-table references).
    assert "`proj.ds.tbl`" in sql
    assert DEFAULT_TABLE not in sql
    # The stats the reference computes (get_data.py:10-46): totals,
    # distinct sessions, stimulus coverage, per-condition distribution.
    assert "COUNT(DISTINCT session)" in sql
    assert "COUNT(DISTINCT stimulus_frequency)" in sql
    assert "COUNT(DISTINCT stimulus_amplitude)" in sql
    assert "GROUP BY session, condition" in sql
    assert "GROUP BY condition" in sql
    for agg in ("MIN(n_trials)", "MAX(n_trials)", "AVG(n_trials)"):
        assert agg in sql


@pytest.mark.parametrize("frac", [0.1, 0.25])
def test_stratified_sample_sql_contract(frac):
    client = _FakeClient(pd.DataFrame({"session": ["a"]}))
    out = get_stratified_sample(client, frac=frac, table="proj.ds.tbl")
    assert list(out["session"]) == ["a"]
    (sql,) = client.queries
    assert "`proj.ds.tbl`" in sql
    # FARM_FINGERPRINT ranking, stratified per condition
    # (reference get_data.py:54-81).
    assert "FARM_FINGERPRINT(CAST(session AS STRING))" in sql
    assert "PARTITION BY condition" in sql
    # The requested fraction reaches the CEIL threshold verbatim.
    assert re.search(
        rf"CEIL\(n_sessions \* {re.escape(str(frac))}\)", sql
    ), sql
    # Sampling selects whole sessions (join back on session id).
    assert "JOIN selected USING (session)" in sql


def test_export_full_dataset_with_stub_client(tmp_path):
    df = synthetic_lfp_frame(n_sessions=10, trials_per_session=6,
                             trace_len=600, seed=3)
    client = _FakeClient(df)
    out_root = tmp_path / "export"
    out_root.mkdir()
    paths = export_full_dataset_to_gcs(
        table="proj.ds.tbl", client=client, output_root=str(out_root)
    )
    # One full-table query, against the requested table.
    (sql,) = client.queries
    assert sql.strip() == "SELECT * FROM `proj.ds.tbl`"

    assert set(paths) == {"train", "val", "test"}
    splits = {name: pq.read_table(p).to_pandas() for name, p in paths.items()}
    # Nothing lost, nothing duplicated.
    assert sum(len(s) for s in splits.values()) == len(df)
    # Session-disjoint splits (the reference's leakage gate).
    sess = {name: set(s["session"]) for name, s in splits.items()}
    assert not (sess["train"] & sess["val"])
    assert not (sess["train"] & sess["test"])
    assert not (sess["val"] & sess["test"])
    # Both classes present in train (stratified grouping).
    assert set(splits["train"]["condition"]) == {"FMR1", "WT"}
    # Deterministic: the same stub data reproduces identical splits
    # (StratifiedGroupKFold seed 42 — data/splits.py).
    out_root2 = tmp_path / "export2"
    out_root2.mkdir()
    paths2 = export_full_dataset_to_gcs(
        table="proj.ds.tbl", client=_FakeClient(df),
        output_root=str(out_root2),
    )
    for name in paths:
        a = pq.read_table(paths[name]).to_pandas()
        b = pq.read_table(paths2[name]).to_pandas()
        assert list(a["session"]) == list(b["session"])
