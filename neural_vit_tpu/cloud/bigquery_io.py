"""BigQuery access: dataset statistics and stratified session sampling.

Host-side, unchanged in spirit from the reference (`cloud/get_data.py`):
dataset-level SQL stats over the LFP table and FARM_FINGERPRINT-ranked
stratified session sampling. The google-cloud-bigquery dependency is
optional; construction fails lazily with a clear error when absent.
"""

from __future__ import annotations

from typing import Optional

DEFAULT_TABLE = "neural-ds-fe73.lab6_mouse_lfp.auditory_cortex"


def _require_bigquery():
    try:
        from google.cloud import bigquery
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "google-cloud-bigquery is required for BigQuery access"
        ) from exc
    return bigquery


def make_client(project: Optional[str] = None):
    bigquery = _require_bigquery()
    return bigquery.Client(project=project)


def dataset_stats(client, table: str = DEFAULT_TABLE):
    """Dataset-level statistics (reference `get_data.py:5-47`): trial and
    session counts, per-condition sessions, trials-per-session distribution,
    stimulus frequency/amplitude coverage."""
    query = f"""
    WITH per_session AS (
      SELECT session, condition, COUNT(*) AS n_trials
      FROM `{table}`
      GROUP BY session, condition
    )
    SELECT
      (SELECT COUNT(*) FROM `{table}`) AS total_trials,
      (SELECT COUNT(DISTINCT session) FROM `{table}`) AS total_sessions,
      (SELECT COUNT(DISTINCT stimulus_frequency) FROM `{table}`) AS n_stim_freqs,
      (SELECT COUNT(DISTINCT stimulus_amplitude) FROM `{table}`) AS n_stim_amps,
      ARRAY(
        SELECT AS STRUCT condition, COUNT(*) AS n_sessions,
               SUM(n_trials) AS n_trials,
               MIN(n_trials) AS min_trials_per_session,
               MAX(n_trials) AS max_trials_per_session,
               AVG(n_trials) AS avg_trials_per_session
        FROM per_session GROUP BY condition
      ) AS per_condition
    """
    return client.query(query).to_dataframe()


def get_stratified_sample(client, frac: float = 0.1, table: str = DEFAULT_TABLE):
    """Deterministic stratified session sample via FARM_FINGERPRINT ranking
    (reference `get_data.py:50-95`): rank sessions per condition by the hash
    of their id and keep the first `frac` of each stratum — reproducible
    without a seed because the hash is content-addressed."""
    query = f"""
    WITH sessions AS (
      SELECT session, condition,
             ROW_NUMBER() OVER (
               PARTITION BY condition
               ORDER BY FARM_FINGERPRINT(CAST(session AS STRING))
             ) AS rk,
             COUNT(*) OVER (PARTITION BY condition) AS n_sessions
      FROM (SELECT DISTINCT session, condition FROM `{table}`)
    ),
    selected AS (
      SELECT session FROM sessions
      WHERE rk <= CAST(CEIL(n_sessions * {frac}) AS INT64)
    )
    SELECT t.* FROM `{table}` t
    JOIN selected USING (session)
    """
    return client.query(query).to_dataframe()


def auth_smoke() -> str:
    """Auth check (reference `cloud/gcloud_test.py`)."""
    from google.cloud import storage

    client = storage.Client()
    return client.project
