#!/bin/bash
# r8 probe batch 2 — sequential (probe hygiene)
cd /root/repo
set -x
python tools/buffer_probe.py 100000 1000 64 > tools/out_r8/buffer_probe.json 2> tools/out_r8/buffer_probe.err
python tools/recall_structure_study.py tools/out_r8/recall_structure.json > tools/out_r8/recall_structure.log 2>&1
sleep 30   # let load drain before the timing-sensitive releg
python tools/quiet4_rerun.py tools/out_r8/quiet4b.json > tools/out_r8/quiet4b.log 2> tools/out_r8/quiet4b.err
echo DONE > tools/out_r8/BATCH2_DONE
