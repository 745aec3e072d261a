#!/usr/bin/env bash
# Multi-host training launcher.
#
# Reference analogue: tools/dist_train.sh (torch.distributed.launch, one
# process per GPU).  JAX SPMD needs ONE process per HOST: all local TPU
# chips join the data-parallel mesh automatically, and multi-host pods are
# joined via jax.distributed (coordinator address in env).
#
# Single host (all local chips):
#   tools/dist_train.sh CONFIG [extra args...]
# Multi-host pod (run on every host):
#   COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=4 PROCESS_ID=$i \
#   tools/dist_train.sh CONFIG [extra args...]
set -e
CONFIG=$1
shift
export ORP_COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-}
export ORP_NUM_PROCESSES=${NUM_PROCESSES:-}
export ORP_PROCESS_ID=${PROCESS_ID:-}
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
