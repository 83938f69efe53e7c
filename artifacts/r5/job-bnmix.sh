# fresh-session witness of the compiled-kernel contracts (post bound fix)
timeout 1200 python -m pytest tests/test_tpu_compiled.py -x -q -p no:cacheprovider
echo "tpu_compiled rc=$?"
# bn_mix per-pass microbench (time-boxed; stalled twice this round — the
# flush-instrumented run identifies where)
timeout 600 python scripts/bnmix_microbench.py --iters 30
echo "bnmix rc=$?"
