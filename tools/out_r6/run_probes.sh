#!/bin/bash
cd /root/repo
set -x
O=tools/out_r6
python tools/bulk_search_probe.py 300000 262144 32   > $O/bulk300k.log 2>&1
python tools/simjoin_probe.py 200000 16384 1536      > $O/simjoin1536.log 2>&1
python tools/ivf2048_probe.py 1000000 2048 64        > $O/ivf2048_1m.log 2>&1
python tools/compaction_probe.py 1000000 10000 64    > $O/compaction1m.log 2>&1
python tools/ivf2048_probe.py 4000000 2048 64        > $O/ivf2048_4m.log 2>&1
echo DONE_ALL_PROBES > $O/STATUS
