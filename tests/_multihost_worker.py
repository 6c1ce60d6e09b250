"""Worker process for the 2-process CPU multihost smoke test.

Each worker owns 4 virtual CPU devices; `jax.distributed.initialize`
assembles an 8-device GLOBAL mesh across the two processes (Gloo stands in
for ICI/DCN). The worker then runs the REAL production `train()` loop —
per-process batch feeding via `make_array_from_process_local_data`
(`data/loader.py` multiprocess mode), sharded train/eval steps over the
global mesh, allgathered AUC — and prints its final metrics as a RESULT
line the test compares across processes and against a single-process run.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
           <train_pre> <val_pre> <test_pre>
"""

import json
import os
import sys

# N local virtual devices per process (default 2 — this all runs on ONE
# physical core, and XLA's CPU thread-pool scheduling degrades fast with
# extra virtual devices under contention); keep the suite's CPU collective
# rendezvous timeouts.
_LOCAL_DEVICES = int(os.environ.get("NEURAL_VIT_MH_DEVICES", "2"))
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(
    f for f in flags.split() if "force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={_LOCAL_DEVICES}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    process_id, num_processes, port = (int(a) for a in sys.argv[1:4])
    train_pre, val_pre, test_pre = sys.argv[4:7]

    from neural_vit_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == _LOCAL_DEVICES * num_processes

    from neural_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # machine-keyed CPU dir (same host → safe)

    from neural_vit_tpu.data.loader import DataLoaderConfig
    from neural_vit_tpu.parallel.mesh import MeshSpec
    from neural_vit_tpu.training.config import TrainConfig
    from neural_vit_tpu.training.loop import train

    results = train(TrainConfig(
        train_paths=[train_pre], val_paths=[val_pre], test_paths=[test_pre],
        output_dir=None,               # no checkpoint plane in the smoke
        run_name=f"mh-worker-{process_id}",
        epochs=2, lr=1e-3, n_trials=4, stride=2,
        model_size="tiny", embed_dim=64, n_heads=2, n_layers=2,
        patch_trial=2, patch_freq=8, patch_time=8,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        loader=DataLoaderConfig(batch_size=16),
        compute_dtype="float32", use_flash_attention=False,
        mesh=MeshSpec(data=_LOCAL_DEVICES * num_processes, model=1),
        handle_preemption=False,
    ))
    print("RESULT " + json.dumps({
        "process": process_id,
        "best_val_auc": results["best_val_auc"],
        "best_val_acc": results["best_val_acc"],
        "test_auc": results["test_auc"],
        "test_acc": results["test_acc"],
        "test_loss": results["test_loss"],
        "final_train_loss": results["history"][-1]["train/loss"],
    }), flush=True)


if __name__ == "__main__":
    main()
