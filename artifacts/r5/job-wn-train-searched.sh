# WN cycle (VERDICT item 5): search at the WN skew, decode, retrain.
bash artifacts/r5/job-wn-search.sh || exit 1
GENO=$(ls -t artifacts/r5/wn-search/*/genotypes.json | head -1)
python - <<PY
import json
g = json.load(open("$GENO"))
for c in g: c["score_func"] = "sf_DisMult"
open("artifacts/r5/geno-wn-searched.json", "w").write(json.dumps(g))
# the published (FB) cell as the cross-skew baseline arm
pub = json.load(open("artifacts/r5/geno-published.json"))
open("artifacts/r5/geno-wn-published.json", "w").write(json.dumps(pub))
PY
python -m mr_gnas_tpu.cli lp-train --compile-cache .jax_cache --dataset synthetic-wn \
  --epochs 30 --eval-every 5 --batch-size 1024 --seed 0 \
  --feature-dim 128 --init-fea-dim 128 --num-base-r 23 \
  --genotype "$(cat artifacts/r5/geno-wn-searched.json)" \
  --save-dir artifacts/r5/wn-train-searched --log-every 100 --save-model-freq 10 --steps-per-call 1 --pallas-agg true
