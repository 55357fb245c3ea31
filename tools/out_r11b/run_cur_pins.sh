#!/bin/bash
cd /root/repo
for i in 1 2 3; do
  while [ "$(cut -d. -f1 /proc/loadavg)" -ge 3 ]; do sleep 20; done
  SPARK_GRAFT_BENCH_ONLY=curation100k python bench.py > tools/out_r11b/cur_pin$i.json 2> tools/out_r11b/cur_pin$i.log
  cp tools/bench_full_latest.json tools/out_r11b/cur_pin${i}_full.json 2>/dev/null
done
echo done > tools/out_r11b/cur_pins.done
