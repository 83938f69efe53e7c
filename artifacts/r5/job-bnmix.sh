python scripts/bnmix_microbench.py --iters 30
