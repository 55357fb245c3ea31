#!/bin/bash
# r8 probe batch — sequential, one at a time (probe hygiene)
cd /root/repo
set -x
python tools/quiet4_rerun.py tools/out_r8/quiet4.json > tools/out_r8/quiet4.log 2> tools/out_r8/quiet4.err
python tools/ivf2048_probe.py 4000000 2048 64 1 "128,64,16,16" > tools/out_r8/ivf2048_4m_rebal.json 2> tools/out_r8/ivf2048_4m_rebal.err
python tools/ivf2048_probe.py 4000000 2048 64 1 "64,16" '{"train_max_iter": "40", "train_points_per_centroid": "512"}' > tools/out_r8/ivf2048_4m_deepfit.json 2> tools/out_r8/ivf2048_4m_deepfit.err
echo DONE > tools/out_r8/BATCH_DONE
