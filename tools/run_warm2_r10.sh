#!/bin/bash
cd /root/repo
set -x
python tools/warm_probe.py cold > tools/out_r10/warm2_cold.json 2> tools/out_r10/warm2_cold.err
python tools/warm_probe.py warm > tools/out_r10/warm2_warm.json 2> tools/out_r10/warm2_warm.err
echo DONE > tools/out_r10/WARM2_DONE
