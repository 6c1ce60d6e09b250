"""Cross-host data-parallel seam: 2-process CPU smoke test.

Validates the multi-host path end-to-end with REAL multi-process SPMD
(two OS processes × 4 virtual CPU devices → one 8-device global mesh,
Gloo collectives): `jax.distributed` plumbing, per-process batch feeding
(`make_array_from_process_local_data` behind `BatchIterator`), sharded
train/eval steps, and allgathered epoch metrics. The two processes must
agree EXACTLY (they reduce the same global state), and match a
single-process 8-device run of the identical config to numerical
tolerance (reduction orders differ across runtimes).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from neural_vit_tpu.data.pipeline import preprocess_splits
from neural_vit_tpu.data.splits import create_session_splits_df
from neural_vit_tpu.data.synthetic import synthetic_lfp_frame
from neural_vit_tpu.ops.spectrogram import SpectrogramConfig

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


@pytest.fixture(scope="module")
def mh_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    df = synthetic_lfp_frame(n_sessions=8, trials_per_session=10,
                             trace_len=5200, seed=21)
    tr, va, te = create_session_splits_df(df, 0.25, 0.25)
    out = {}
    for name, d in (("train", tr), ("val", va), ("test", te)):
        raw = str(tmp / f"{name}.parquet")
        d.to_parquet(raw)
        out[name] = str(tmp / f"{name}_pre.parquet")
        out[f"{name}_raw"] = raw
    preprocess_splits(
        out["train_raw"], out["val_raw"], out["test_raw"],
        out["train"], out["val"], out["test"],
        cfg=SpectrogramConfig(fs=1000, nperseg=126, noverlap=116),
        batch_size=64, verbose=False, backend="cpu",
    )
    return tmp, out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_train(mh_data, tmp_path):
    tmp, out = mh_data
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port),
             out["train"], out["val"], out["test"]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(tmp_path), env=env, text=True,
        ))
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=1500)
            outputs.append(stdout)
    finally:
        for p in procs:  # never leave orphaned workers contending
            if p.poll() is None:
                p.kill()
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, (
            f"worker {pid} failed:\n{stdout[-4000:]}"
        )
    results = []
    for stdout in outputs:
        lines = [l for l in stdout.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{stdout[-2000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))

    r0, r1 = results
    # Identical global state on both processes ⇒ identical metrics
    # (allgathered AUC inputs, replicated loss scalars).
    for k in ("best_val_auc", "test_auc", "test_acc", "test_loss",
              "final_train_loss"):
        assert r0[k] == pytest.approx(r1[k], abs=1e-9), k
        assert np.isfinite(r0[k]), k

    # And the 2×4-device run must match a single-process 8-device run of
    # the same config (cross-runtime reduction-order tolerance).
    from neural_vit_tpu.data.loader import DataLoaderConfig
    from neural_vit_tpu.parallel.mesh import MeshSpec
    from neural_vit_tpu.training.config import TrainConfig
    from neural_vit_tpu.training.loop import train

    single = train(TrainConfig(
        train_paths=[out["train"]], val_paths=[out["val"]],
        test_paths=[out["test"]],
        output_dir=None, run_name="mh-single",
        epochs=2, lr=1e-3, n_trials=4, stride=2,
        model_size="tiny", embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
        mesh=MeshSpec(data=8, model=1),
        handle_preemption=False,
    ))
    assert r0["test_loss"] == pytest.approx(single["test_loss"], abs=5e-3)
    assert r0["final_train_loss"] == pytest.approx(
        single["history"][-1]["train/loss"], abs=5e-3
    )
    assert r0["test_auc"] == pytest.approx(single["test_auc"], abs=2e-2)
