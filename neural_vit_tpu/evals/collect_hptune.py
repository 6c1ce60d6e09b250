"""HP-tune run aggregation — thin preset over `collect_runs`
(the reference keeps a near-duplicate script `collect_hptune_details.py`
with different defaults; here it's the same collector pointed at the
hptune runs root/experiment)."""

from __future__ import annotations

import argparse

from neural_vit_tpu.evals.collect_runs import collect_runs


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics_root", default="gs://lfp-temporal-vit/hptune-runs-2")
    ap.add_argument("--experiment", default="lfp-temporal-vit-hptune")
    ap.add_argument("--project", default=None)
    ap.add_argument("--location", default=None)
    ap.add_argument("--output", default="hptune_run_details.json")
    args = ap.parse_args(argv)
    collect_runs(
        args.metrics_root, args.experiment, args.project, args.location,
        args.output,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
