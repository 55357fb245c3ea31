#!/bin/bash
cd /root/repo
set -x
python tools/sq8_size_probe.py 1000000 64 > tools/out_r10/sq8_size.json 2> tools/out_r10/sq8_size.err
python tools/check_oracle.py > tools/out_r10/check_oracle.log 2>&1
python bench.py > tools/out_r10/bench_q4.json 2> tools/out_r10/bench_q4.err
echo DONE > tools/out_r10/POST_DONE
