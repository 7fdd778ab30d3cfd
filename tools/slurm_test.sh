#!/usr/bin/env bash
# Slurm eval launcher (reference tools/slurm_test.sh parity).
# Usage: ./tools/slurm_test.sh <partition> <job_name> <config> <ckpt> [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
srun -p "$PARTITION" --job-name="$JOB_NAME" --kill-on-bad-exit=1 \
    python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
