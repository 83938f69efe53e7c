# bn_mix per-pass microbench first (item 6 closer; ~8 min)
python scripts/bnmix_microbench.py --iters 30 > artifacts/r5/bnmix-tpu.log 2>&1
echo "bnmix rc=$? (log: artifacts/r5/bnmix-tpu.log)"
python -m mr_gnas_tpu.cli lp-train --compile-cache .jax_cache --dataset synthetic-fb   --epochs 30 --eval-every 5 --batch-size 1024 --seed 1   --feature-dim 128 --init-fea-dim 128 --num-base-r 23   --genotype "$(cat artifacts/r5/geno-searched.json)"   --save-dir artifacts/r5/arm-searched-s1 --log-every 100 --save-model-freq 10 --steps-per-call 1 --pallas-agg true
