#!/bin/bash
# Relay health watcher: probe the TPU relay every ~3 min, append status to
# /tmp/relay_status.log. Run with run_in_background; kill via /tmp/relay_watch.pid.
# Probe = import jax (tpu), one tiny reduction to host. A healthy relay answers
# in <10s; a degraded one times out at 110s (see CLAUDE.md "Timing on the relay").
echo $$ > /tmp/relay_watch.pid
while true; do
  start=$(date +%s)
  out=$(timeout 110 python -c "
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
v = float(jnp.sum(x @ x))
print(f'rtt={time.time()-t0:.1f}s v={v:.0f} dev={jax.devices()[0].platform}')
" 2>/dev/null | grep -o 'rtt=.*' | tail -1)
  dt=$(( $(date +%s) - start ))
  if [ -n "$out" ]; then
    echo "$(date +%H:%M:%S) ok dt=${dt}s ${out}" >> /tmp/relay_status.log
  else
    echo "$(date +%H:%M:%S) ok=False dt=${dt}s" >> /tmp/relay_status.log
  fi
  sleep 160
done
