#!/usr/bin/env bash
# Data-parallel training launcher (reference tools/dist_train.sh parity).
#
# Single-controller JAX needs no per-GPU process spawner: one process
# drives every local chip through the data-parallel mesh automatically
# (mrcnn3d/parallel/mesh.py).  For multi-HOST pods, set the standard jax
# distributed env (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
# JAX_PROCESS_ID) or run under the TPU pod launcher; per-host data
# sharding is handled by the epoch-seeded loader shard (data/loader.py).
#
# Usage: ./tools/dist_train.sh <config> [extra train.py args...]
set -euo pipefail
CONFIG=$1
shift || true
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
