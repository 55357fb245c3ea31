#!/bin/bash
# quiet-host vec1m re-pin batch (VERDICT r10 task 1): >=3 sequential
# standalone runs of the vec1m bench section; pin = per-key MEDIAN.
cd /root/repo
for i in 1 2 3; do
  echo "=== run $i start $(date +%s) load $(cut -d' ' -f1 /proc/loadavg)" >> tools/out_r11/vec1m_pin.log
  SPARK_GRAFT_BENCH_ONLY=vec1m python bench.py \
    > tools/out_r11/vec1m_pin${i}.json 2>> tools/out_r11/vec1m_pin.log
  cp tools/bench_full_latest.json tools/out_r11/vec1m_pin${i}_full.json 2>/dev/null
  echo "=== run $i done $(date +%s) load $(cut -d' ' -f1 /proc/loadavg)" >> tools/out_r11/vec1m_pin.log
done
echo ALL_DONE >> tools/out_r11/vec1m_pin.log
