# cold-compile + step probe of the full-graph retrain with Pallas CSR
# aggregators, honest fresh cache dir (VERDICT item 7 experiment)
timeout 1800 python scripts/fullgraph_probe.py --score-func sf_DisMult --pallas-agg --cache-dir .jax_cache_probe --steps 10
echo "probe rc=$?"
