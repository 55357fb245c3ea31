#!/bin/bash
cd /root/repo
OUT=tools/out_r7
while ! grep -q DONE3 $OUT/probes_r7.log 2>/dev/null; do sleep 60; done
echo "=== 7. bulk 300k FULL quiet rerun ===" >> $OUT/probes_r7.log
cat /proc/loadavg >> $OUT/probes_r7.log
python tools/bulk_search_probe.py 300000 262144 32 > $OUT/bulk300k_quiet.json 2> $OUT/bulk300k_quiet.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo DONE4 >> $OUT/probes_r7.log
