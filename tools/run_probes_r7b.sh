#!/bin/bash
# r7 second probe batch — runs AFTER run_probes_r7.sh completes
cd /root/repo
OUT=tools/out_r7
while ! grep -q DONE $OUT/probes_r7.log 2>/dev/null; do sleep 60; done
echo "=== 5. disk graph probe 1M (r7 feature) ===" >> $OUT/probes_r7.log
python tools/disk_graph_probe.py 1000000 10000 64 > $OUT/disk_graph.json 2> $OUT/disk_graph.err
echo "rc=$?" >> $OUT/probes_r7.log; cat /proc/loadavg >> $OUT/probes_r7.log
echo DONE2 >> $OUT/probes_r7.log
