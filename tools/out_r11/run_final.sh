#!/bin/bash
cd /root/repo
python bench.py > tools/out_r11/final_bench.json 2> tools/out_r11/final_bench.log
cp tools/bench_full_latest.json tools/out_r11/final_bench_full.json 2>/dev/null
echo BENCH_DONE >> tools/out_r11/final.log
python -m pytest tests/ -q > tools/out_r11/pytest_final.log 2>&1
echo PYTEST_DONE >> tools/out_r11/final.log
