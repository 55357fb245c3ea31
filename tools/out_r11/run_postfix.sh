#!/bin/bash
# post-warm-bulk-fix: validate first-bulk-leg drop, then re-pin runs
cd /root/repo
python tools/bulk_variance_probe.py 6 tools/out_r11/bulk_variance_postfix.json \
  > tools/out_r11/bulk_variance_postfix.log 2>&1
for i in 4 5 6; do
  echo "=== run $i start $(date +%s) load $(cut -d' ' -f1 /proc/loadavg)" >> tools/out_r11/vec1m_pin.log
  SPARK_GRAFT_BENCH_ONLY=vec1m python bench.py \
    > tools/out_r11/vec1m_pin${i}.json 2>> tools/out_r11/vec1m_pin.log
  cp tools/bench_full_latest.json tools/out_r11/vec1m_pin${i}_full.json 2>/dev/null
  echo "=== run $i done $(date +%s) load $(cut -d' ' -f1 /proc/loadavg)" >> tools/out_r11/vec1m_pin.log
done
echo POSTFIX_DONE >> tools/out_r11/vec1m_pin.log
