#!/bin/bash
cd /root/repo
# wait for the 8M probe to finish (its process exits and json appears)
while [ ! -f tools/out_r11b/curation_scale_8m.json ] && pgrep -f curation_scale_probe > /dev/null; do sleep 30; done
sleep 5
python -m pytest tests/ -q > tools/out_r11b/pytest_final.log 2>&1
tail -2 tools/out_r11b/pytest_final.log > tools/out_r11b/pytest_final_summary.txt
python tools/check_oracle.py > tools/out_r11b/check_oracle.log 2>&1
tail -3 tools/out_r11b/check_oracle.log > tools/out_r11b/check_oracle_summary.txt
echo done > tools/out_r11b/gates.done
