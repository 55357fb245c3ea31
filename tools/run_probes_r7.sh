#!/bin/bash
# Sequential r7 probe batch (probe hygiene: one at a time, load recorded)
cd /root/repo
OUT=tools/out_r7
date > $OUT/probes_r7.log
echo "=== 1. wide1536 rerun (task 2b) ===" >> $OUT/probes_r7.log
python tools/wide1536_rerun.py > $OUT/wide1536_rerun.json 2> $OUT/wide1536_rerun.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 2. bulk 300k driver leg (task 2a) ===" >> $OUT/probes_r7.log
python tools/bulk_search_probe.py 300000 262144 32 > $OUT/bulk300k.json 2> $OUT/bulk300k.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 3. ivf build breakdown 1M/2048 (task 3) ===" >> $OUT/probes_r7.log
python tools/ivf_build_breakdown.py 1000000 2048 64 1 > $OUT/build_breakdown.json 2> $OUT/build_breakdown.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo "=== 4. ivf2048 4M normalized w/ grouped kernel (task 5) ===" >> $OUT/probes_r7.log
python tools/ivf2048_probe.py 4000000 2048 64 1 > $OUT/ivf2048_4m.json 2> $OUT/ivf2048_4m.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo DONE >> $OUT/probes_r7.log
date >> $OUT/probes_r7.log
