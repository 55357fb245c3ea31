#!/bin/bash
# full-suite bench runs for vec1m re-pinning + artifact validation (r11)
cd /root/repo
for i in 1 2 3; do
  echo "=== full $i start $(date +%s) load $(cut -d' ' -f1 /proc/loadavg)" >> tools/out_r11/full_bench.log
  python bench.py > tools/out_r11/full_bench${i}.json 2>> tools/out_r11/full_bench.log
  cp tools/bench_full_latest.json tools/out_r11/full_bench${i}_full.json 2>/dev/null
  echo "=== full $i done $(date +%s) load $(cut -d' ' -f1 /proc/loadavg)" >> tools/out_r11/full_bench.log
done
echo ALL_DONE >> tools/out_r11/full_bench.log
