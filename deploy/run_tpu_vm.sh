#!/usr/bin/env bash
# Provision a Cloud TPU VM, build the image, and launch flagship training —
# the TPU counterpart of the reference's run_with_nvidia_docker.sh (its
# 3-tier GPU fallback chain becomes a TPU-VM + CPU-smoke fallback here).
#
# Usage:
#   deploy/run_tpu_vm.sh [v5litepod-8] [us-central1-a] [my-tpu-vm]
# Requires: gcloud authenticated with TPU quota; HF_TOKEN exported for
# Common Voice access (gated dataset).
set -euo pipefail

ACCEL="${1:-v5litepod-8}"
ZONE="${2:-us-central1-a}"
NAME="${3:-ste-tpu-vm}"
IMAGE="ste-tpu:latest"

if ! command -v gcloud >/dev/null; then
  echo "gcloud not found — running the CPU smoke fallback locally" >&2
  exec python -m speech_transcript_embeddings_tpu.train preset=tiny \
      train.num_epochs=1 train.output_dir=runs/smoke \
      data.num_synthetic_samples=32 data.batch_size=8
fi

if ! gcloud compute tpus tpu-vm describe "$NAME" --zone "$ZONE" >/dev/null 2>&1; then
  gcloud compute tpus tpu-vm create "$NAME" \
    --zone "$ZONE" --accelerator-type "$ACCEL" \
    --version tpu-ubuntu2204-base
fi

# ship the repo and build the image on the TPU VM (docker is preinstalled)
gcloud compute tpus tpu-vm scp --zone "$ZONE" --recurse \
  "$(git rev-parse --show-toplevel)" "$NAME":~/ste

gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" --command "
  cd ~/ste &&
  sudo docker build -f deploy/Dockerfile.tpu -t $IMAGE . &&
  sudo docker run --rm --privileged --net=host \
    -v \$HOME/runs:/work/runs -e HF_TOKEN='${HF_TOKEN:-}' $IMAGE
"

echo 'Artifacts land in ~/runs/cv_flagship on the TPU VM:'
echo '  training.log test_metrics.json retrieval_metrics.json *.png + checkpoints'
