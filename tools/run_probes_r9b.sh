#!/bin/bash
# r9 batch B: 16M/4096 retry — single persisted index (fullprobe exact),
# heap capped at 24g so Spark spills instead of tripping the global OOM
cd /root/repo
set -x
SPARK_DRIVER_MEMORY=24g python tools/ivf2048_probe.py 16000000 4096 64 1 "64,16,128,16" '{}' "mog:4096:0.05" fullprobe > tools/out_r9/ivf4096_16m_mog2.json 2> tools/out_r9/ivf4096_16m_mog2.err
echo DONE > tools/out_r9/BATCH_B_DONE
