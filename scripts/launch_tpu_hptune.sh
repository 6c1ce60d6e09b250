#!/usr/bin/env bash
# Launch an HP sweep across TPU VM slices (replaces the reference's Vertex
# HP-tuning job launcher, scripts/launch_hptune.sh). Trials are
# embarrassingly parallel: each slice runs one trial of
# neural_vit_tpu.training.hptune with its own hyperparameters; metrics land
# in GCS JSONL and are joined by evals/collect_runs.
#
# Usage: scripts/launch_tpu_hptune.sh trials.txt
#   trials.txt: one line of CLI flags per trial, e.g.
#     --lr 3e-4 --dropout 0.2
#     --lr 1e-3 --dropout 0.35 --weight_decay 0.02
set -euo pipefail

TRIALS_FILE="${1:?usage: launch_tpu_hptune.sh trials.txt}"
TPU_PREFIX="${TPU_PREFIX:-lfp-hptune}"
ZONE="${ZONE:-us-central1-a}"
ACCEL_TYPE="${ACCEL_TYPE:-v5litepod-8}"
RUNTIME_VERSION="${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}"

i=0
while IFS= read -r trial_args; do
  [[ -z "${trial_args}" || "${trial_args}" == \#* ]] && continue
  name="${TPU_PREFIX}-${i}"
  echo "Trial ${i} on ${name}: ${trial_args}"
  gcloud compute tpus tpu-vm create "${name}" \
    --zone="${ZONE}" --accelerator-type="${ACCEL_TYPE}" \
    --version="${RUNTIME_VERSION}" --preemptible --async
  (
    sleep 120  # wait for provisioning; queued-resources preferred in prod
    gcloud compute tpus tpu-vm scp --recurse --zone="${ZONE}" \
      "$(git rev-parse --show-toplevel)" "${name}":~/neural_vit_tpu_repo
    gcloud compute tpus tpu-vm ssh "${name}" --zone="${ZONE}" --command="
      cd ~/neural_vit_tpu_repo &&
      pip install -q 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html &&
      pip install -q flax optax orbax-checkpoint pyarrow gcsfs scikit-learn pandas scipy &&
      python -m neural_vit_tpu.training.hptune ${trial_args}
    "
    gcloud compute tpus tpu-vm delete "${name}" --zone="${ZONE}" --quiet
  ) &
  i=$((i + 1))
done < "${TRIALS_FILE}"
wait
echo "All ${i} trials dispatched."
