#!/bin/bash
# Poll the axon TPU tunnel until it initializes; log status to /tmp/tunnel_poll.log.
# One probe client at a time; probe has a hard per-attempt timeout.
for i in $(seq 1 60); do
  ts=$(date +%H:%M:%S)
  out=$(timeout 180 python -c "
import jax
d = jax.devices()
print('UP', d[0].device_kind)
" 2>&1 | tail -1)
  echo "$ts attempt $i: $out" >> /tmp/tunnel_poll.log
  case "$out" in UP*) echo "$ts TUNNEL UP" >> /tmp/tunnel_poll.log; exit 0;; esac
  sleep 240
done
exit 1
