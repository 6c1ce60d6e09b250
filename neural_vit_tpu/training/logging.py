"""Experiment logging as a stack of composable metric sinks.

Keeps the reference's *contracts* (`training/experiment_logging.py` in the
reference repo) without its structure:

  * JSONL sink: path convention `<base>/<run_id>/metrics/metrics_<ts>_<pid>
    .jsonl` and record schema `{"step": int, "<split>/<metric>": float}` —
    load-bearing, the evals collectors glob and parse these
    (reference `evals/collect_run_details.py:34-74`).
  * Vertex Experiments sink: AIP_* env resolution and the AlreadyExists
    reconnect when parallel HP trials race to create the experiment
    (reference `experiment_logging.py:107-118`).
  * TensorBoard scalar sink.
  * On close, the whole local run directory (metrics JSONL *and* TB event
    files) is uploaded recursively when the output target is gs://
    (reference `training/train.py:296-305` pushes the run dir the same way).

Design: each sink is a small object with `params` / `metrics` / `close`;
`ExperimentLogger` fans every call across whichever sinks opened
successfully. Optional dependencies degrade to "sink not opened".
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, is_dataclass
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional


def _stamp() -> str:
    return datetime.now(timezone.utc).strftime("%Y%m%d-%H%M%S")


def build_run_id(prefix: str = "temporal-vit") -> str:
    """`temporal-vit-YYYYmmdd-HHMMSS-xxxx` (reference run ids carry the same
    prefix+timestamp; the random suffix keeps concurrent mesh-slice trials
    started in the same second from colliding)."""
    return f"{prefix}-{_stamp()}-{uuid.uuid4().hex[:4]}"


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


@dataclass(frozen=True)
class RunPaths:
    """Where a run's artifacts live: a local working directory (always) and
    an optional gs:// mirror that receives the whole directory on close."""

    workdir: str            # local: holds metrics/ and tb/
    mirror: Optional[str]   # gs://.../<run_id> or None

    @staticmethod
    def create(run_id: str, output_dir: Optional[str]) -> "RunPaths":
        if output_dir and output_dir.startswith("gs://"):
            return RunPaths(
                workdir=os.path.join("runs", run_id),
                mirror=f"{output_dir.rstrip('/')}/{run_id}",
            )
        base = output_dir or "runs"
        return RunPaths(workdir=os.path.join(base, run_id), mirror=None)

    def new_metrics_file(self) -> str:
        """Mint a fresh timestamped JSONL path (each call names a NEW file —
        call once per sink, not per lookup)."""
        return os.path.join(
            self.workdir, "metrics", f"metrics_{_stamp()}_{os.getpid()}.jsonl"
        )

    def tb_dir(self, run_id: str) -> str:
        aip = os.environ.get("AIP_TENSORBOARD_LOG_DIR")
        if aip:
            return os.path.join(aip, run_id)
        return os.path.join(self.workdir, "tb")


class JsonlSink:
    """Append-only JSONL, one record per log_metrics call."""

    def __init__(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._file = open(path, "a", encoding="utf-8", buffering=1)
        self.path = path

    def params(self, params: Dict[str, Any]) -> None:
        pass  # params go to Vertex/TB only, as in the reference

    def metrics(self, metrics: Dict[str, float], step: Optional[int]) -> None:
        self._file.write(json.dumps({"step": step, **metrics}) + "\n")

    def close(self) -> None:
        self._file.close()


class TensorBoardSink:
    def __init__(self, log_dir: str) -> None:
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception:
            from tensorboardX import SummaryWriter  # type: ignore[no-redef]
        if not log_dir.startswith("gs://"):
            os.makedirs(log_dir, exist_ok=True)
        self._writer = SummaryWriter(log_dir)

    def params(self, params: Dict[str, Any]) -> None:
        pass

    def metrics(self, metrics: Dict[str, float], step: Optional[int]) -> None:
        for name, value in metrics.items():
            self._writer.add_scalar(name, value, global_step=step)

    def close(self) -> None:
        self._writer.flush()
        self._writer.close()


class VertexExperimentsSink:
    """Vertex Experiments run, surviving the create-experiment race between
    parallel HP trials: a losing AlreadyExists triggers one reconnect."""

    def __init__(self, run_id: str, project: str, location: str,
                 experiment: str) -> None:
        from google.cloud import aiplatform
        try:
            from google.api_core.exceptions import AlreadyExists
        except Exception:  # pragma: no cover
            AlreadyExists = ()  # type: ignore[assignment]

        self._aip = aiplatform
        try:
            aiplatform.init(project=project, location=location,
                            experiment=experiment)
            aiplatform.start_run(run_id)
        except AlreadyExists:
            # Another trial created the experiment between our existence
            # check and create — re-init against the now-existing one.
            aiplatform.init(project=project, location=location)
            aiplatform.init(project=project, location=location,
                            experiment=experiment)
            aiplatform.start_run(run_id)

    @staticmethod
    def _plain(value: Any):
        if value is None or isinstance(value, (str, int, float)):
            return value
        if isinstance(value, (list, tuple, set, dict)):
            return json.dumps(value, default=str)
        return str(value)

    def params(self, params: Dict[str, Any]) -> None:
        plain = {k: p for k, v in params.items()
                 if (p := self._plain(v)) is not None}
        if plain:
            self._aip.log_params(plain)

    def metrics(self, metrics: Dict[str, float], step: Optional[int]) -> None:
        try:
            self._aip.log_metrics(metrics, step=step)
        except TypeError:  # pre-step-kwarg SDKs
            self._aip.log_metrics(metrics)

    def close(self) -> None:
        self._aip.end_run()


def _open_sinks(run_id: str, paths: RunPaths, *, project_id, location,
                experiment_name, enable_vertex, enable_tensorboard) -> List:
    """Open whatever sinks the environment supports; JSONL always opens."""
    sinks: List = [JsonlSink(paths.new_metrics_file())]
    if enable_tensorboard:
        try:
            sinks.append(TensorBoardSink(paths.tb_dir(run_id)))
        except Exception:
            pass
    if enable_vertex:
        project = project_id or _env("AIP_PROJECT_ID", "GOOGLE_CLOUD_PROJECT")
        loc = location or _env("AIP_LOCATION")
        exp = experiment_name or _env("AIP_EXPERIMENT_NAME") or "temporal-vit"
        if project and loc and exp:
            try:
                sinks.append(
                    VertexExperimentsSink(run_id, project, loc, exp))
            except Exception as exc:
                print(f"Vertex Experiments sink unavailable: {exc}")
    return sinks


class ExperimentLogger:
    """Fan-out logger over the opened sinks, plus the end-of-run upload."""

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
        self.paths = RunPaths.create(run_id, output_dir)
        self.sinks = _open_sinks(
            run_id, self.paths, project_id=project_id, location=location,
            experiment_name=experiment_name, enable_vertex=enable_vertex,
            enable_tensorboard=enable_tensorboard,
        )

    def _fan(self, call) -> None:
        for sink in self.sinks:
            try:
                call(sink)
            except Exception as exc:
                print(f"{type(sink).__name__} log failed: {exc}")

    def log_params(self, params: Dict[str, Any]) -> None:
        self._fan(lambda s: s.params(params))

    def log_metrics(self, metrics: Dict[str, float],
                    step: Optional[int] = None) -> None:
        self._fan(lambda s: s.metrics(metrics, step))

    def close(self) -> None:
        self._fan(lambda s: s.close())
        if self.paths.mirror:
            # Push the whole run dir — metrics JSONL and TB events — to the
            # gs:// mirror (reference train.py:296-305; upload failures are
            # non-fatal there too).
            try:
                import gcsfs

                fs = gcsfs.GCSFileSystem()
                fs.put(self.paths.workdir, self.paths.mirror, recursive=True)
            except Exception as exc:
                print(f"run-dir upload to {self.paths.mirror} failed: {exc}")


def log_config(logger: ExperimentLogger, config) -> None:
    """Log a config dataclass (or mapping) as run params."""
    logger.log_params(asdict(config) if is_dataclass(config) else dict(config))
