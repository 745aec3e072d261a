#!/usr/bin/env bash
# Slurm launcher for evaluation (reference tools/slurm_test.sh analogue).
# One process per host; results are merged on process 0.
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NTASKS=${5:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
COORD_PORT=${COORD_PORT:-29400}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${PY_ARGS:-""}

srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks="${NTASKS}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    bash -c '
      head_node=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
      export ORP_COORDINATOR_ADDRESS=${head_node}:'"${COORD_PORT}"'
      export ORP_NUM_PROCESSES=${SLURM_NTASKS}
      export ORP_PROCESS_ID=${SLURM_PROCID}
      exec python -u '"$(dirname "$0")"'/test.py '"${CONFIG}"' \
          --checkpoint '"${CHECKPOINT}"' '"${PY_ARGS}"'
    '
