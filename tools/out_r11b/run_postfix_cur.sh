#!/bin/bash
cd /root/repo
while pgrep -f "pytest tests" > /dev/null; do sleep 30; done
sleep 10
SPARK_GRAFT_BENCH_ONLY=curation100k python bench.py > tools/out_r11b/cur_postfix.json 2> tools/out_r11b/cur_postfix.log
echo done > tools/out_r11b/postfix.done
