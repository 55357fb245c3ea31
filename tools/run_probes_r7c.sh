#!/bin/bash
cd /root/repo
OUT=tools/out_r7
while ! grep -q DONE2 $OUT/probes_r7.log 2>/dev/null; do sleep 60; done
echo "=== 6. wide1536 rerun #2 (unambiguous quiet) ===" >> $OUT/probes_r7.log
python tools/wide1536_rerun.py > $OUT/wide1536_rerun2.json 2> $OUT/wide1536_rerun2.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo DONE3 >> $OUT/probes_r7.log
