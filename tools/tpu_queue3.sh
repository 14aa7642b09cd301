#!/bin/bash
# Round-3 TPU queue, part 3 -- runs AFTER tpu_queue2.sh completes.
# Purpose: re-capture the multiply-switch evidence lost in the box
# restart (the /tmp A/B jsons from tpu_queue.sh were wiped), produce the
# on-chip all-variant correctness artifact, and probe the split-phase
# u64 Pallas inverse LAST (documented Mosaic compile-hang hazard: a
# wedged remote compile poisons every compile queued behind it).
# One TPU client at a time, each step under its own timeout.
set -u
LOG=/tmp/tpu_queue3
mkdir -p $LOG artifacts
stamp() { date +%H:%M:%S; }
note() { echo "$(stamp) $*" >> $LOG/queue.log; }

# ---- phase 0: wait for queue2 to finish (up to ~4 h) ----
for i in $(seq 1 240); do
  grep -q "QUEUE2 DONE" /tmp/tpu_queue2/queue.log 2>/dev/null && break
  sleep 60
done
if ! grep -q "QUEUE2 DONE" /tmp/tpu_queue2/queue.log 2>/dev/null; then
  note "GIVE UP: queue2 never finished"; exit 1
fi
note "queue2 done -- starting queue3"

# ---- step 1: solinas on-chip exactness ----
NTT_MULMOD=solinas timeout 1800 python -u tools/solinas_tpu_check.py solinas \
  > artifacts/SOLINAS_TPU_CHECK_r03.log 2>&1
note "step1 solinas check rc=$?"

# ---- step 2: approx on-chip exactness ----
NTT_MULHI64=approx timeout 1800 python -u tools/solinas_tpu_check.py approx \
  > artifacts/APPROX_TPU_CHECK_r03.log 2>&1
note "step2 approx check rc=$?"

# ---- step 3: sixstep-u64 A/B (default vs solinas vs approx) ----
for mode in default solinas approx; do
  case $mode in
    solinas) envp=(env NTT_MULMOD=solinas);;
    approx)  envp=(env NTT_MULHI64=approx);;
    *)       envp=(env);;
  esac
  "${envp[@]}" timeout 1500 python -u bench.py --suite \
    --only sixstep-u64,inv-sixstep-u64 --budget-s 1200 \
    --suite-json artifacts/AB_MULMOD_${mode}_r03.json \
    > $LOG/3_ab_${mode}.log 2>&1
  note "step3 A/B $mode rc=$?"
done

# ---- step 4: on-chip all-variant correctness sweep ----
timeout 3600 python -u -m ntt_tpu correctness \
  > artifacts/TPU_ALL_VARIANTS_r03.log 2>&1
note "step4 all-variant correctness rc=$?"

# ---- step 5 (LAST, hang hazard): split-phase u64 Pallas inverse ----
# fixture 10 = smallest u64-limb-path case (31-bit q, m=14); fixture 13
# (52-bit) only attempted if 10 survives.
timeout 2700 python -u tools/mosaic_check.py --fixtures 10 --dirs fwd,inv \
  > artifacts/TPU_MOSAIC_CHECK_r03.log 2>&1
note "step5 mosaic u64 f10 rc=$?"
if grep -q "OK" artifacts/TPU_MOSAIC_CHECK_r03.log; then
  timeout 2700 python -u tools/mosaic_check.py --fixtures 13 --dirs fwd,inv \
    >> artifacts/TPU_MOSAIC_CHECK_r03.log 2>&1
  note "step5b mosaic u64 f13 rc=$?"
fi

note "QUEUE3 DONE"
