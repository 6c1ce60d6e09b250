#!/usr/bin/env bash
# Launch a training run on a Cloud TPU VM (replaces the reference's Vertex AI
# custom-job launcher, scripts/launch_train.sh: GPU containers → TPU VMs via
# gcloud compute tpus).
#
# Usage:
#   scripts/launch_tpu_train.sh [--create] [--name NAME] [--zone ZONE] \
#       [--type v5litepod-8] [-- EXTRA_TRAIN_ARGS...]
#
# Requires: gcloud authenticated; GCS buckets with preprocessed parquets.
set -euo pipefail

TPU_NAME="${TPU_NAME:-lfp-tvit}"
ZONE="${ZONE:-us-central1-a}"
ACCEL_TYPE="${ACCEL_TYPE:-v5litepod-8}"
RUNTIME_VERSION="${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}"
CREATE=0
EXTRA_ARGS=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --create) CREATE=1; shift ;;
    --name) TPU_NAME="$2"; shift 2 ;;
    --zone) ZONE="$2"; shift 2 ;;
    --type) ACCEL_TYPE="$2"; shift 2 ;;
    --) shift; EXTRA_ARGS=("$@"); break ;;
    *) echo "unknown arg: $1" >&2; exit 1 ;;
  esac
done

if [[ "$CREATE" == "1" ]]; then
  echo "Creating TPU VM ${TPU_NAME} (${ACCEL_TYPE}) in ${ZONE}..."
  gcloud compute tpus tpu-vm create "${TPU_NAME}" \
    --zone="${ZONE}" \
    --accelerator-type="${ACCEL_TYPE}" \
    --version="${RUNTIME_VERSION}" \
    --preemptible
fi

echo "Syncing repo to TPU VM..."
gcloud compute tpus tpu-vm scp --recurse --zone="${ZONE}" \
  "$(git rev-parse --show-toplevel)" "${TPU_NAME}":~/neural_vit_tpu_repo

echo "Installing deps + launching training..."
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone="${ZONE}" --command="
  cd ~/neural_vit_tpu_repo &&
  pip install -q 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html &&
  pip install -q flax optax orbax-checkpoint pyarrow gcsfs scikit-learn pandas scipy &&
  python -m neural_vit_tpu.training.loop ${EXTRA_ARGS[*]:-}
"
