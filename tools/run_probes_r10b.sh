#!/bin/bash
# r10 batch B — sequential (probe hygiene)
cd /root/repo
set -x
# IVF2048,SQ8 composite at 1M mog: storage tier under pruned search at scale
# (exact baseline = separate raw Flat index, so recall is vs TRUE neighbors)
python tools/ivf2048_probe.py 1000000 2048 64 1 "16,4,16" '{}' "mog:2048:0.05" flat ",SQ8" \
  > tools/out_r10/ivf2048_1m_mog_sq8.json 2> tools/out_r10/ivf2048_1m_mog_sq8.err
# 4M adversarial hash with the corpus pass ON — does the cap hold at 4x rows?
python tools/ivf2048_probe.py 4000000 2048 64 1 "128,16,4" '{}' hash fullprobe \
  > tools/out_r10/ivf2048_4m_hash_on.json 2> tools/out_r10/ivf2048_4m_hash_on.err
echo DONE > tools/out_r10/BATCHB_DONE
