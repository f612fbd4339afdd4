#!/bin/bash
# Wait for the axon TPU to respond, then run the given command.
cd "$(dirname "$0")/.."
while true; do
  if timeout 90 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" 2>/dev/null; then
    echo "[tpu_when_alive] TPU responsive at $(date)"
    break
  fi
  echo "[tpu_when_alive] TPU unresponsive at $(date), retrying in 120s"
  sleep 120
done
exec "$@"
