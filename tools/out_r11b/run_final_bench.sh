#!/bin/bash
cd /root/repo
while [ ! -f tools/out_r11b/gates.done ]; do sleep 30; done
while [ "$(cut -d. -f1 /proc/loadavg)" -ge 3 ]; do sleep 20; done
python bench.py > tools/out_r11b/final_bench.json 2> tools/out_r11b/final_bench.log
cp tools/bench_full_latest.json tools/out_r11b/final_bench_full.json 2>/dev/null
echo done > tools/out_r11b/final_bench.done
