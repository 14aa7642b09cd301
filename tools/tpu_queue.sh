#!/bin/bash
# Serialized round-3 TPU work queue.  Waits for the axon tunnel to come
# back, then runs the exactness checks and the sixstep-u64 A/B -- ONE
# client at a time, each under its own timeout, logging to
# /tmp/tpu_queue/.  Stops before any default-flipping decision (that is
# a human/code step informed by the A/B numbers).
set -u
LOG=/tmp/tpu_queue
mkdir -p $LOG
stamp() { date +%H:%M:%S; }

# ---- phase 0: wait for the tunnel (up to ~4 h) ----
up=0
for i in $(seq 1 60); do
  out=$(timeout 240 python -c "import jax; print('UP', jax.devices()[0].device_kind)" 2>&1 | tail -1)
  echo "$(stamp) probe $i: $out" >> $LOG/poll.log
  case "$out" in UP*) up=1; break;; esac
  sleep 180
done
if [ $up -eq 0 ]; then echo "$(stamp) GIVE UP: tunnel never came back" >> $LOG/poll.log; exit 1; fi
echo "$(stamp) tunnel is UP -- starting queue" >> $LOG/poll.log

# ---- step 1: solinas on-chip exactness ----
NTT_MULMOD=solinas timeout 1500 python -u tools/solinas_tpu_check.py solinas \
  > $LOG/1_solinas_check.log 2>&1
echo "$(stamp) step1 solinas check rc=$?" >> $LOG/poll.log

# ---- step 2: approx on-chip exactness ----
NTT_MULHI64=approx timeout 1500 python -u tools/solinas_tpu_check.py approx \
  > $LOG/2_approx_check.log 2>&1
echo "$(stamp) step2 approx check rc=$?" >> $LOG/poll.log

# ---- step 3: sixstep-u64 A/B (default vs solinas vs approx) ----
for mode in default solinas approx; do
  case $mode in
    solinas) envp=(env NTT_MULMOD=solinas);;
    approx)  envp=(env NTT_MULHI64=approx);;
    *)       envp=(env);;
  esac
  "${envp[@]}" timeout 1500 python -u bench.py --suite --only sixstep-u64,inv-sixstep-u64 \
    --budget-s 900 --suite-json $LOG/3_ab_${mode}.json \
    > $LOG/3_ab_${mode}.log 2>&1
  echo "$(stamp) step3 A/B $mode rc=$?" >> $LOG/poll.log
done

echo "$(stamp) QUEUE DONE" >> $LOG/poll.log
