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
) -> dict:
    client = make_client(project)
    print(f"Querying full table {table}...")
    df = client.query(f"SELECT * FROM `{table}`").to_dataframe()
    print(f"Fetched {len(df)} trials across {df.session.nunique()} sessions")

    train_df, val_df, test_df = create_session_splits_df(df, test_size, val_size)
    paths = {}
    for name, d in (("train", train_df), ("val", val_df), ("test", test_df)):
        path = f"gs://{bucket}/{prefix}/{name}.parquet"
        d.to_parquet(path, index=False)
        paths[name] = path
        print(f"Wrote {len(d)} rows → {path}")
    return paths


if __name__ == "__main__":  # pragma: no cover
    export_full_dataset_to_gcs()
