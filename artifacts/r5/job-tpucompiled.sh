# solo fresh-session witness of the compiled-kernel contracts (VERDICT item 8)
timeout 1200 python -m pytest tests/test_tpu_compiled.py -x -q -p no:cacheprovider
echo "tpu_compiled rc=$?"
