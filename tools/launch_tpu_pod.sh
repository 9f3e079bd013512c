#!/bin/bash
# TPU-pod launcher for multi-host training — the TPU-native analogue of the
# reference's SLURM launcher (/root/reference/train.slurm: sbatch header +
# torch.distributed.launch --nproc_per_node=2 trainUM.py --launcher pytorch).
#
# On Cloud TPU there is no SLURM and no per-process NCCL launcher: every host
# of a pod slice runs the SAME program, and jax.distributed.initialize()
# discovers the pod topology from the TPU runtime metadata (no manual
# coordinator/rank wiring needed on TPU VMs). This script fans the training
# command out to all workers of a pod slice with `gcloud ... ssh --worker=all`
# and tails rank 0's log.
#
# Usage:
#   tools/launch_tpu_pod.sh <tpu-name> <zone> [config.yml] [extra trainUM args]
# Example:
#   tools/launch_tpu_pod.sh my-v5e-16 us-west4-1 Configurations/config.yml
#
# Knobs (env):
#   REPO_DIR   remote checkout path            (default: ~/instancediff_tpu)
#   PYTHON     remote python                   (default: python3)
#   LOG_DIR    remote log directory            (default: ~/instancediff_logs)

set -euo pipefail

TPU_NAME=${1:?usage: launch_tpu_pod.sh <tpu-name> <zone> [config] [args...]}
ZONE=${2:?zone required (e.g. us-west4-1)}
CONFIG=${3:-Configurations/config.yml}
shift $(( $# > 3 ? 3 : $# ))
EXTRA_ARGS=${*:-}

REPO_DIR=${REPO_DIR:-'~/instancediff_tpu'}
PYTHON=${PYTHON:-python3}
LOG_DIR=${LOG_DIR:-'~/instancediff_logs'}
STAMP=$(date +%Y%m%d_%H%M%S)

# --multihost -> trainUM calls jax.distributed.initialize(); on TPU VMs the
# coordinator address / process count / process id all come from the TPU
# runtime, so the same command line works on every worker (contrast the
# reference's per-rank env-var init, trainUM.py:50-70).
REMOTE_CMD=$(cat <<EOF
mkdir -p ${LOG_DIR}
cd ${REPO_DIR}
nohup ${PYTHON} trainUM.py -opt=${CONFIG} --multihost ${EXTRA_ARGS} \
  > ${LOG_DIR}/train_${STAMP}_w\${TPU_WORKER_ID:-0}.log 2>&1 &
echo "worker \${TPU_WORKER_ID:-0} started (pid \$!)"
EOF
)

echo ">> launching on all workers of ${TPU_NAME} (${ZONE})"
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone="${ZONE}" \
  --worker=all --command="${REMOTE_CMD}"

echo ">> tailing rank-0 log (ctrl-c detaches; training keeps running)"
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone="${ZONE}" \
  --worker=0 --command="tail -f ${LOG_DIR}/train_${STAMP}_w0.log"
