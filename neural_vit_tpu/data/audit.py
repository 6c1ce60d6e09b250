"""Data-quality audit (reference `data/data_audit.py:5-100`):

trial/session counts, per-condition session distribution, trials-per-session
distribution, stimulus frequency/amplitude coverage, trace-length quality
(dominant-length detection, truncated-string payloads, parse errors), and an
optional comparison of a sample against full-dataset statistics.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Optional

import pandas as pd

from neural_vit_tpu.data.sequences import parse_trace


def audit_lfp_dataset(df: pd.DataFrame, expected_fs: int = 1000,
                      expected_seconds: Optional[float] = None) -> Dict:
    report: Dict = {
        "n_trials": int(len(df)),
        "n_sessions": int(df.session.nunique()),
        "conditions": df.condition.value_counts().to_dict(),
        "sessions_per_condition": df.groupby("condition").session.nunique().to_dict(),
    }
    tps = df.groupby("session").size()
    report["trials_per_session"] = {
        "min": int(tps.min()), "max": int(tps.max()),
        "mean": float(tps.mean()), "median": float(tps.median()),
    }
    for col in ("stimulus_frequency", "stimulus_amplitude"):
        if col in df.columns:
            report[col] = sorted(
                float(v) for v in df[col].dropna().unique()
            )

    lengths: Counter = Counter()
    truncated = 0
    parse_errors = 0
    for cell in df["trace"]:
        if isinstance(cell, str) and "..." in cell:
            truncated += 1
            continue
        try:
            arr = parse_trace(cell)
        except Exception:
            parse_errors += 1
            continue
        if arr.size == 0:
            parse_errors += 1
        else:
            lengths[int(arr.size)] += 1
    mode_len = lengths.most_common(1)[0][0] if lengths else 0
    report["trace_quality"] = {
        "mode_length": mode_len,
        "mode_seconds": mode_len / expected_fs,
        "n_at_mode": lengths.get(mode_len, 0),
        "n_other_lengths": sum(
            n for ln, n in lengths.items() if ln != mode_len
        ),
        "n_truncated_strings": truncated,
        "n_parse_errors": parse_errors,
    }
    if expected_seconds is not None:
        expected = int(expected_seconds * expected_fs)
        report["trace_quality"]["n_below_expected"] = sum(
            n for ln, n in lengths.items() if ln < expected
        )
    return report


def compare_sample_to_full(sample_report: Dict, full_report: Dict) -> Dict:
    """Coverage of a sampled subset vs full-dataset statistics
    (reference `data_audit.py` sample-vs-full comparison)."""
    out = {}
    for key in ("stimulus_frequency", "stimulus_amplitude"):
        if key in sample_report and key in full_report:
            missing = sorted(set(full_report[key]) - set(sample_report[key]))
            out[f"{key}_missing_in_sample"] = missing
    out["session_fraction"] = (
        sample_report["n_sessions"] / max(1, full_report["n_sessions"])
    )
    out["trial_fraction"] = (
        sample_report["n_trials"] / max(1, full_report["n_trials"])
    )
    return out


def print_audit_report(report: Dict) -> None:
    print(f"Trials: {report['n_trials']}, sessions: {report['n_sessions']}")
    print(f"Conditions: {report['conditions']}")
    print(f"Sessions/condition: {report['sessions_per_condition']}")
    print(f"Trials/session: {report['trials_per_session']}")
    tq = report["trace_quality"]
    print(
        f"Trace mode length {tq['mode_length']} ({tq['mode_seconds']:.1f}s): "
        f"{tq['n_at_mode']} at mode, {tq['n_other_lengths']} other, "
        f"{tq['n_truncated_strings']} truncated, {tq['n_parse_errors']} parse errors"
    )
