#!/bin/bash
# Background TPU-tunnel health poller: pings a tiny matmul every 3 min,
# appends a status line to $1 (default /tmp/tpu_poll.log). Used during
# relay outages so the session can do CPU work and check back cheaply.
LOG=${1:-/tmp/tpu_poll.log}
while true; do
  t0=$(date +%s)
  out=$(timeout 180 python - <<'EOF' 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("OK", float((x@x).sum()))
EOF
)
  rc=$?
  t1=$(date +%s)
  echo "$(date -u +%FT%TZ) rc=$rc dt=$((t1-t0))s ${out##*$'\n'}" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "$(date -u +%FT%TZ) TUNNEL UP" >> "$LOG"
  fi
  sleep 180
done
