#!/bin/bash
# Serialized TPU job chain: runs each listed job script in order, logging
# to artifacts/r5/<name>.log. The axon TPU is single-tenant, so jobs
# must never overlap; this runner is the only place chip jobs start.
set -u
cd /root/repo
for job in "$@"; do
  name=$(basename "$job" .sh)
  echo "[chain] $(date -u +%H:%M:%S) starting $name" >> artifacts/r5/chain.log
  bash "$job" > "artifacts/r5/${name}.log" 2>&1
  echo "[chain] $(date -u +%H:%M:%S) finished $name rc=$?" >> artifacts/r5/chain.log
done
echo "[chain] $(date -u +%H:%M:%S) ALL DONE" >> artifacts/r5/chain.log
