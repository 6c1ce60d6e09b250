"""Full-dataset export: BigQuery → split parquets on GCS
(reference `cloud/export_to_gcs.py:8-50`).

Queries the full table, creates the seed-42 session-stratified
train/val/test split, and writes three parquets — the inputs to the
preprocessing pipeline.
"""

from __future__ import annotations

from typing import Optional

from neural_vit_tpu.cloud.bigquery_io import DEFAULT_TABLE, make_client
from neural_vit_tpu.data.splits import create_session_splits_df


def export_full_dataset_to_gcs(
    bucket: str = "lfp_spec_datasets",
    prefix: str = "neural/v2",
    table: str = DEFAULT_TABLE,
    test_size: float = 0.15,
    val_size: float = 0.15,
    project: Optional[str] = None,
    client=None,
    output_root: Optional[str] = None,
) -> dict:
    """Args beyond the reference surface: `client` injects a BigQuery client
    (tests pass a stub), `output_root` redirects the three parquets to any
    fsspec-writable root (e.g. a local dir) instead of gs://bucket/prefix.
    """
    if client is None:
        client = make_client(project)
    root = output_root or f"gs://{bucket}/{prefix}"
    print(f"Querying full table {table}...")
    df = client.query(f"SELECT * FROM `{table}`").to_dataframe()
    print(f"Fetched {len(df)} trials across {df.session.nunique()} sessions")

    train_df, val_df, test_df = create_session_splits_df(df, test_size, val_size)
    paths = {}
    for name, d in (("train", train_df), ("val", val_df), ("test", test_df)):
        path = f"{root.rstrip('/')}/{name}.parquet"
        d.to_parquet(path, index=False)
        paths[name] = path
        print(f"Wrote {len(d)} rows → {path}")
    return paths


if __name__ == "__main__":  # pragma: no cover
    export_full_dataset_to_gcs()
