#!/usr/bin/env bash
# TPU-VM launch script — the deployment counterpart of the
# reference's Elastic Beanstalk pipeline (/root/reference/.github/
# workflows/main.yml), re-targeted at Cloud TPU.
#
# Creates a v5e TPU VM (single host or pod slice), installs the
# framework, and starts either the web service or a training run.
#
# Usage:
#   ./scripts/launch_tpu_vm.sh <name> [accelerator] [zone] [mode]
#     accelerator: v5litepod-1 (default) | v5litepod-8 | v5litepod-16...
#     mode: serve (default) | train
#
# Multi-host slices: the same commands run on every worker
# (--worker=all); tpu2048.parallel.distributed.initialize() picks up
# the pod topology from the TPU metadata service automatically.

set -euo pipefail

NAME="${1:?usage: launch_tpu_vm.sh <name> [accelerator] [zone] [mode]}"
ACCEL="${2:-v5litepod-1}"
ZONE="${3:-us-central1-a}"
MODE="${4:-serve}"
REPO_TARBALL="/tmp/tpu2048.tar.gz"

echo ">> packaging repo"
git archive --format=tar.gz -o "${REPO_TARBALL}" HEAD

echo ">> creating TPU VM ${NAME} (${ACCEL}) in ${ZONE}"
gcloud compute tpus tpu-vm create "${NAME}" \
  --zone="${ZONE}" \
  --accelerator-type="${ACCEL}" \
  --version=tpu-ubuntu2204-base

echo ">> installing framework"
gcloud compute tpus tpu-vm scp "${REPO_TARBALL}" "${NAME}:/tmp/" \
  --zone="${ZONE}" --worker=all
gcloud compute tpus tpu-vm ssh "${NAME}" --zone="${ZONE}" --worker=all \
  --command="
    mkdir -p ~/tpu2048 && tar xzf /tmp/tpu2048.tar.gz -C ~/tpu2048 &&
    pip install -q 'jax[tpu]>=0.4.30' \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html &&
    pip install -q numpy pytest"

case "${MODE}" in
  serve)
    echo ">> starting web service on :5000"
    gcloud compute tpus tpu-vm ssh "${NAME}" --zone="${ZONE}" \
      --command="cd ~/tpu2048 && PORT=5000 nohup python -m \
        tpu2048.apps.server --host 0.0.0.0 > ~/serve.log 2>&1 &"
    ;;
  train)
    echo ">> starting flagship training on all workers"
    gcloud compute tpus tpu-vm ssh "${NAME}" --zone="${ZONE}" --worker=all \
      --command="cd ~/tpu2048 && nohup python -u \
        scripts/train_flagship.py flagship > ~/train.log 2>&1 &"
    ;;
  *)
    echo "unknown mode: ${MODE}" >&2
    exit 1
    ;;
esac

echo ">> done. ssh: gcloud compute tpus tpu-vm ssh ${NAME} --zone=${ZONE}"
