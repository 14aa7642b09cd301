#!/bin/bash
# Round-3 TPU artifact queue -- run AFTER the multiply-default decision
# is applied to the tree.  One client at a time, each step timed out,
# Mosaic probe deliberately LAST (documented compile-hang hazard: a
# wedged remote compile poisons every compile behind it).
set -u
LOG=/tmp/tpu_queue2
mkdir -p $LOG artifacts
stamp() { date +%H:%M:%S; }
note() { echo "$(stamp) $*" >> $LOG/queue.log; }

# 1. headline capture, default args (also warms the compile cache with
#    the final kernel traces for the driver's round-end run)
timeout 1200 python -u bench.py > artifacts/BENCH_HEADLINE_r03_final.log 2>&1
note "headline rc=$?"

# 2-3. full per-variant suites at both widths
timeout 3000 python -u bench.py --suite --budget-s 2700 \
  --suite-json artifacts/BENCH_SUITE_q62_r03.json \
  > artifacts/BENCH_SUITE_q62_r03.log 2>&1
note "suite q62 rc=$?"
timeout 3000 python -u bench.py --suite --q-bits 27 --budget-s 2700 \
  --suite-json artifacts/BENCH_SUITE_q27_r03.json \
  > artifacts/BENCH_SUITE_q27_r03.log 2>&1
note "suite q27 rc=$?"

# 4. small-N auto-variant sweep
timeout 3000 python -u tools/auto_sweep.py --out artifacts/AUTO_SWEEP_r03.json \
  > $LOG/auto_sweep.log 2>&1
note "auto_sweep rc=$?"

# 5. D=1 TPU HLO async-collective check for the chunked-overlap claim
timeout 1800 python -u tools/overlap_study.py --ndev 1 --m 18 --chunks 1,2,4 \
  --out artifacts/OVERLAP_TPU_r03.log > $LOG/overlap_tpu.log 2>&1
note "overlap tpu rc=$?"

# 6. final default-args bench to leave the cache warm for the driver
timeout 900 python -u bench.py > $LOG/final_warm.log 2>&1
note "final warm rc=$?"

note "QUEUE2 DONE (mosaic probe intentionally separate)"
