#!/usr/bin/env bash
# Inference launcher (reference analogue: tools/dist_test.sh).
# SPMD: one process drives all local chips; see dist_train.sh for pods.
set -e
CONFIG=$1
shift
python "$(dirname "$0")/test.py" "$CONFIG" "$@"
