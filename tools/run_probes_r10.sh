#!/bin/bash
# r10 probe batch — sequential, one at a time (probe hygiene memory).
# Launch only after bench_q1 has finished.
cd /root/repo
set -x
# task 2: two more quiet bench runs — LOCAL_BASELINES for the new vec1m
# keys are pinned from the min of the three
python bench.py > tools/out_r10/bench_q2.json 2> tools/out_r10/bench_q2.err
python bench.py > tools/out_r10/bench_q3.json 2> tools/out_r10/bench_q3.err
echo DONE > tools/out_r10/BENCH_DONE
# task 6: ivf_recall_nprobe4 floor distribution, 5 fresh processes
for i in 1 2 3 4 5; do
  python tools/np4_floor_repin.py /root/testdata/sf0.1 \
    > tools/out_r10/np4_repin_$i.json 2> tools/out_r10/np4_repin_$i.err
done
echo DONE > tools/out_r10/REPIN_DONE
# task 1: corpus-rebalance receipt on BOTH corpora at 1M/2048 (same args
# as r9's legs for comparability) + the OFF control on hash
python tools/ivf2048_probe.py 1000000 2048 64 1 "128,16,4,16" '{}' hash \
  > tools/out_r10/ivf2048_1m_hash_on.json 2> tools/out_r10/ivf2048_1m_hash_on.err
python tools/ivf2048_probe.py 1000000 2048 64 1 "128,16,4,16" '{"rebalance_clusters":"0"}' hash \
  > tools/out_r10/ivf2048_1m_hash_off.json 2> tools/out_r10/ivf2048_1m_hash_off.err
python tools/ivf2048_probe.py 1000000 2048 64 1 "128,16,4,16" '{}' "mog:2048:0.05" \
  > tools/out_r10/ivf2048_1m_mog_on.json 2> tools/out_r10/ivf2048_1m_mog_on.err
echo DONE > tools/out_r10/SKEW_DONE
# task 4: warm() A/B, one fresh process per arm
python tools/warm_probe.py cold > tools/out_r10/warm_cold.json 2> tools/out_r10/warm_cold.err
python tools/warm_probe.py warm > tools/out_r10/warm_warm.json 2> tools/out_r10/warm_warm.err
echo DONE > tools/out_r10/WARM_DONE
# task 5: grouped simjoin A/B at load < 2 (r9 ran it at load 13-27)
python tools/grouped_simjoin_ab.py 1000000 512 64 100000 \
  > tools/out_r10/grouped_simjoin_ab.json 2> tools/out_r10/grouped_simjoin_ab.err
echo DONE > tools/out_r10/BATCH_DONE
