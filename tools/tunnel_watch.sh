#!/bin/bash
# Continuously poll the TPU tunnel (tiny matmul in a fresh subprocess) and
# log state transitions. A fresh process per probe is mandatory: a JAX
# runtime that wedged on a dead tunnel stays poisoned after it returns.
# Usage: tools/tunnel_watch.sh [logfile]
LOG=${1:-/tmp/tunnel_watch.log}
prev=""
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).sum().block_until_ready()
" >/dev/null 2>&1; then
    state=LIVE
  else
    state=down
  fi
  if [ "$state" != "$prev" ]; then
    echo "$(date -u +%FT%TZ) $state" >> "$LOG"
    prev=$state
  fi
  sleep 45
done
