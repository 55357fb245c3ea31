#!/bin/bash
# r9 batch C: 16M/4096 with the chunked assignment UDF (OOM fix)
cd /root/repo
set -x
SPARK_DRIVER_MEMORY=24g python tools/ivf2048_probe.py 16000000 4096 64 1 "64,16,128,16" '{}' "mog:4096:0.05" fullprobe > tools/out_r9/ivf4096_16m_mog3.json 2> tools/out_r9/ivf4096_16m_mog3.err
echo DONE > tools/out_r9/BATCH_C_DONE
