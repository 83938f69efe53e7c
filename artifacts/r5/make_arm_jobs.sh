#!/bin/bash
# generate the retrain-arm job scripts; $1 = extra flags (e.g. "--pallas-agg true")
EXTRA="${1:-}"
for arm in searched published; do
  for seed in 0 1; do
    cat > "artifacts/r5/job-arm-$arm-s$seed.sh" <<JOB
python -m mr_gnas_tpu.cli lp-train --compile-cache .jax_cache --dataset synthetic-fb \
  --epochs 30 --eval-every 5 --batch-size 1024 --seed $seed \
  --feature-dim 128 --init-fea-dim 128 --num-base-r 23 \
  --genotype "\$(cat artifacts/r5/geno-$arm.json)" \
  --save-dir artifacts/r5/arm-$arm-s$seed --log-every 100 --save-model-freq 10 --steps-per-call 1 $EXTRA
JOB
  done
done
echo generated
