#!/bin/bash
cd /root/repo
OUT=tools/out_r7
echo "=== 3b. ivf build breakdown RERUN (post sample-repartition fix) ===" >> $OUT/probes_r7.log
cat /proc/loadavg >> $OUT/probes_r7.log
python tools/ivf_build_breakdown.py 1000000 2048 64 1 > $OUT/build_breakdown_fixed.json 2> $OUT/build_breakdown_fixed.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 4. ivf2048 4M normalized (grouped kernel + fast fit) ===" >> $OUT/probes_r7.log
python tools/ivf2048_probe.py 4000000 2048 64 1 > $OUT/ivf2048_4m.json 2> $OUT/ivf2048_4m.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 5. disk graph probe 1M ===" >> $OUT/probes_r7.log
python tools/disk_graph_probe.py 1000000 10000 64 > $OUT/disk_graph.json 2> $OUT/disk_graph.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 6. wide1536 rerun #2 ===" >> $OUT/probes_r7.log
python tools/wide1536_rerun.py > $OUT/wide1536_rerun2.json 2> $OUT/wide1536_rerun2.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 7. bulk 300k FULL quiet rerun ===" >> $OUT/probes_r7.log
python tools/bulk_search_probe.py 300000 262144 32 > $OUT/bulk300k_quiet.json 2> $OUT/bulk300k_quiet.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo DONE-ALL >> $OUT/probes_r7.log
date >> $OUT/probes_r7.log
