#!/bin/bash
# r10 capstone: largest-yet corpus-rebalance validation — 16M x 64 /
# IVF4096 on the adversarial hash corpus (r9's 16M leg was clusterable
# mog; the corpus pass has now been proven at 1M and 4M hash).
cd /root/repo
set -x
SPARK_DRIVER_MEMORY=24g python tools/ivf2048_probe.py 16000000 4096 64 1 "64,16" '{}' hash fullprobe \
  > tools/out_r10/ivf4096_16m_hash_on.json 2> tools/out_r10/ivf4096_16m_hash_on.err
echo DONE > tools/out_r10/BATCHC_DONE
