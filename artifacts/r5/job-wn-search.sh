# full NAS search at the WN18RR skew (VERDICT item 5): big entity table
# (40,943), few relations (11)
python -m mr_gnas_tpu.cli lp-search --compile-cache .jax_cache --dataset synthetic-wn --epochs 8000 --warm-epochs 10 --max-patience 500 --feature-dim 200 --init-fea-dim 100 --num-base-r 23 --graph-batch-size 65536 --graph-batch-size-val 2048 --grouped-negatives true --steps-per-call 8 --save-dir artifacts/r5/wn-search --log-every 100 --save-model-freq 1000
