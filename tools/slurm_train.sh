#!/usr/bin/env bash
# Slurm launcher (reference tools/slurm_train.sh parity).
# Usage: ./tools/slurm_train.sh <partition> <job_name> <config> [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
srun -p "$PARTITION" --job-name="$JOB_NAME" --kill-on-bad-exit=1 \
    python "$(dirname "$0")/train.py" "$CONFIG" "$@"
