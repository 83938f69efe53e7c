#!/bin/bash
# wait for the seed-search chain (pid $1) to finish, then run chain-2
while kill -0 "$1" 2>/dev/null; do sleep 20; done
exec bash /root/repo/artifacts/r5/chain.sh /root/repo/artifacts/r5/job-probe.sh /root/repo/artifacts/r5/job-wn-search.sh
