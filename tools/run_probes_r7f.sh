#!/bin/bash
cd /root/repo
OUT=tools/out_r7
echo "=== 8. bulk 300k quiet rerun #2 (post f64 probe-selection fix) ===" >> $OUT/probes_r7.log
cat /proc/loadavg >> $OUT/probes_r7.log
python tools/bulk_search_probe.py 300000 262144 32 > $OUT/bulk300k_final.json 2> $OUT/bulk300k_final.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo DONE-FINAL >> $OUT/probes_r7.log
