#!/bin/bash
while kill -0 "$1" 2>/dev/null; do sleep 20; done
exec bash /root/repo/artifacts/r5/chain.sh \
  /root/repo/artifacts/r5/job-arm-searched-s0.sh \
  /root/repo/artifacts/r5/job-arm-published-s0.sh \
  /root/repo/artifacts/r5/job-arm-searched-s1.sh \
  /root/repo/artifacts/r5/job-arm-published-s1.sh \
  /root/repo/artifacts/r5/job-wn-train-searched.sh \
  /root/repo/artifacts/r5/job-wn-train-published.sh \
  /root/repo/artifacts/r5/job-spc16.sh \
  /root/repo/artifacts/r5/job-bnmix.sh \
  /root/repo/artifacts/r5/job-tpucompiled.sh
