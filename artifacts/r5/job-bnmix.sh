python scripts/bnmix_microbench.py --iters 30
# fresh-session witness of the compiled-kernel contracts (post bound fix)
timeout 1200 python -m pytest tests/test_tpu_compiled.py -x -q -p no:cacheprovider
echo "tpu_compiled rc=$?"
