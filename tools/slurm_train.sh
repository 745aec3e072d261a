#!/usr/bin/env bash
# Slurm launcher for multi-host TPU training.
#
# Reference analogue: tools/slurm_train.sh (srun, --launcher slurm).  JAX
# SPMD runs ONE process per host; Slurm task variables map onto the JAX
# coordinator contract consumed by tools/train.py:
#   SLURM_NTASKS   -> ORP_NUM_PROCESSES
#   SLURM_PROCID   -> ORP_PROCESS_ID
#   first node     -> coordinator host (port 29400 unless COORD_PORT set)
#
# Usage: sbatch/srun environment, then on each task:
#   tools/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [NTASKS]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
NTASKS=${5:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
COORD_PORT=${COORD_PORT:-29400}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${PY_ARGS:-"--validate"}

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
      exec python -u '"$(dirname "$0")"'/train.py '"${CONFIG}"' \
          --work_dir='"${WORK_DIR}"' '"${PY_ARGS}"'
    '
