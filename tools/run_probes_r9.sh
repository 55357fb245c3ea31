#!/bin/bash
# r9 probe batch — sequential, one at a time (probe hygiene memory)
cd /root/repo
set -x
# task 1: np4 drift releg + rebalance A/B + kernel branch A/B (sf0.1)
python tools/np4_releg.py /root/testdata/sf0.1 > tools/out_r9/np4_releg.json 2> tools/out_r9/np4_releg.err
# task 2: ivf_build in-suite vs standalone phase split (sf0.1)
python tools/build_insuite_gap.py /root/testdata/sf0.1 3 > tools/out_r9/build_gap.json 2> tools/out_r9/build_gap.err
# task 3: recall-vs-nprobe on BOTH corpora at 1M/2048 (rotated, np16 twice)
python tools/ivf2048_probe.py 1000000 2048 64 1 "128,16,4,16" '{}' hash > tools/out_r9/ivf2048_1m_hash.json 2> tools/out_r9/ivf2048_1m_hash.err
python tools/ivf2048_probe.py 1000000 2048 64 1 "128,16,4,16" '{}' "mog:2048:0.05" > tools/out_r9/ivf2048_1m_mog.json 2> tools/out_r9/ivf2048_1m_mog.err
# task 4: largest-yet 16M/4096 with rebalance on, clusterable corpus
python tools/ivf2048_probe.py 16000000 4096 64 1 "64,16,128,16" '{}' "mog:4096:0.05" > tools/out_r9/ivf4096_16m_mog.json 2> tools/out_r9/ivf4096_16m_mog.err
# task 7: grouped simjoin rebalance A/B on the skew-prone corpus
python tools/grouped_simjoin_ab.py 1000000 512 64 100000 > tools/out_r9/grouped_simjoin_ab.json 2> tools/out_r9/grouped_simjoin_ab.err
# task 7 done-criterion: wide1536 quiet value
python tools/wide1536_rerun.py > tools/out_r9/wide1536.json 2> tools/out_r9/wide1536.err
echo DONE > tools/out_r9/BATCH_DONE
