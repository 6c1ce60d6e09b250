"""Triple-sink experiment logging: Vertex Experiments + TensorBoard + JSONL.

Contract parity with the reference `ExperimentLogger`
(`training/experiment_logging.py:67-162`): the JSONL sink's path convention
(`<base>/<run_id>/metrics/metrics_<ts>_<pid>.jsonl`) and record schema
(`{"step": int, "<split>/<metric>": float, ...}`) are load-bearing — the
evals collectors glob and parse them (`evals/collect_run_details.py:34-74`).
Vertex and TensorBoard are optional sinks with graceful degradation, exactly
as upstream.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, is_dataclass
from datetime import datetime, timezone
from typing import Any, Dict, Optional

try:  # optional: Vertex Experiments
    from google.cloud import aiplatform
    from google.api_core.exceptions import AlreadyExists
except Exception:  # pragma: no cover
    aiplatform = None
    AlreadyExists = None

try:  # optional: TensorBoard writer (torch's or tensorboardX's)
    from torch.utils.tensorboard import SummaryWriter
except Exception:  # pragma: no cover
    try:
        from tensorboardX import SummaryWriter
    except Exception:
        SummaryWriter = None


def _utcnow() -> str:
    return datetime.now(timezone.utc).strftime("%Y%m%d-%H%M%S")


def build_run_id(prefix: str = "temporal-vit") -> str:
    # Timestamp + short random suffix: concurrent mesh-slice trials started
    # in the same second must not collide on their metrics directory.
    return f"{prefix}-{_utcnow()}-{uuid.uuid4().hex[:4]}"


def _metrics_filename() -> str:
    return f"metrics_{_utcnow()}_{os.getpid()}.jsonl"


def _resolve_project(project_id: Optional[str]) -> Optional[str]:
    return (
        project_id
        or os.environ.get("AIP_PROJECT_ID")
        or os.environ.get("GOOGLE_CLOUD_PROJECT")
    )


def _resolve_location(location: Optional[str]) -> Optional[str]:
    return location or os.environ.get("AIP_LOCATION")


def _resolve_experiment(name: Optional[str]) -> Optional[str]:
    return name or os.environ.get("AIP_EXPERIMENT_NAME") or "temporal-vit"


def _resolve_tb_dir(run_id: str, output_dir: Optional[str]) -> str:
    base = os.environ.get("AIP_TENSORBOARD_LOG_DIR")
    if base:
        return os.path.join(base, run_id)
    if output_dir and not output_dir.startswith("gs://"):
        return os.path.join(output_dir, "tb")
    return os.path.join("runs", run_id)


def _resolve_metrics_dir(run_id: str, output_dir: Optional[str]) -> str:
    if output_dir and not output_dir.startswith("gs://"):
        return os.path.join(output_dir, run_id, "metrics")
    return os.path.join("runs", run_id, "metrics")


def _coerce_param(value: Any):
    if value is None:
        return None
    if isinstance(value, (str, int, float)):
        return value
    if isinstance(value, (list, tuple, set, dict)):
        return json.dumps(value, default=str)
    return str(value)


class ExperimentLogger:
    def __init__(
        self,
        run_id: str,
        *,
        output_dir: Optional[str] = None,
        project_id: Optional[str] = None,
        location: Optional[str] = None,
        experiment_name: Optional[str] = None,
        enable_vertex: bool = True,
        enable_tensorboard: bool = True,
    ) -> None:
        self.run_id = run_id
        self._vertex_active = False
        self._writer = None
        self._metrics_gcs_path = None

        if enable_tensorboard and SummaryWriter is not None:
            log_dir = _resolve_tb_dir(run_id, output_dir)
            if not log_dir.startswith("gs://"):
                os.makedirs(log_dir, exist_ok=True)
            try:
                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._writer = None

        metrics_dir = _resolve_metrics_dir(run_id, output_dir)
        os.makedirs(metrics_dir, exist_ok=True)
        fname = _metrics_filename()
        self._metrics_path = os.path.join(metrics_dir, fname)
        if output_dir and output_dir.startswith("gs://"):
            self._metrics_gcs_path = (
                f"{output_dir.rstrip('/')}/{run_id}/metrics/{fname}"
            )

        if enable_vertex and aiplatform is not None:
            project = _resolve_project(project_id)
            location_r = _resolve_location(location)
            experiment = _resolve_experiment(experiment_name)
            if project and location_r and experiment:
                try:
                    aiplatform.init(
                        project=project, location=location_r, experiment=experiment
                    )
                    aiplatform.start_run(run_id)
                    self._vertex_active = True
                except Exception as exc:  # includes AlreadyExists race
                    if AlreadyExists is not None and isinstance(exc, AlreadyExists):
                        # Parallel HP trial created the experiment first —
                        # reconnect (reference experiment_logging.py:107-118).
                        try:
                            aiplatform.init(project=project, location=location_r)
                            aiplatform.init(
                                project=project, location=location_r,
                                experiment=experiment,
                            )
                            aiplatform.start_run(run_id)
                            self._vertex_active = True
                        except Exception as e:  # pragma: no cover
                            print(f"Vertex reconnect failed: {e}")
                    else:
                        print(f"Vertex AI experiment initialization failed: {exc}")

    def log_params(self, params: Dict[str, Any]) -> None:
        if self._vertex_active:
            sanitized = {
                k: c for k, v in params.items()
                if (c := _coerce_param(v)) is not None
            }
            if sanitized:
                aiplatform.log_params(sanitized)

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        if self._vertex_active:
            try:
                aiplatform.log_metrics(metrics, step=step)
            except TypeError:  # older SDK without step kwarg
                aiplatform.log_metrics(metrics)
        if self._writer is not None:
            for name, value in metrics.items():
                self._writer.add_scalar(name, value, global_step=step)
        record = {"step": step}
        record.update(metrics)
        with open(self._metrics_path, "a", encoding="utf-8") as handle:
            handle.write(json.dumps(record))
            handle.write("\n")

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
        if self._metrics_gcs_path and os.path.exists(self._metrics_path):
            try:
                import gcsfs

                fs = gcsfs.GCSFileSystem()
                fs.put(self._metrics_path, self._metrics_gcs_path)
            except Exception:
                pass
        if self._vertex_active:
            aiplatform.end_run()


def log_config(logger: ExperimentLogger, config) -> None:
    payload = asdict(config) if is_dataclass(config) else dict(config)
    logger.log_params(payload)
