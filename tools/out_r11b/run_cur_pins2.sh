#!/bin/bash
cd /root/repo
for i in 4 5 6; do
  while [ "$(cut -d. -f1 /proc/loadavg)" -ge 3 ]; do sleep 20; done
  SPARK_GRAFT_BENCH_ONLY=curation100k python bench.py > tools/out_r11b/cur_pin$i.json 2> tools/out_r11b/cur_pin$i.log
done
echo done > tools/out_r11b/cur_pins2.done
