"""Compare two lp-search runs: decoded genotypes + alpha-trajectory
agreement.

The selection-fidelity tool behind the bf16 go/no-go (round 3) and the
grouped-vs-chunked negative-layout study (round 4, VERDICT r3 item 8):
two search runs are "selection-equivalent" when they decode identical
genotypes and their stage alphas agree in softmax-cosine and per-edge
argmax.

    python scripts/compare_searches.py artifacts/runA artifacts/runB

Accepts run dirs (the newest lp-search-* subdir is used) or direct
paths to search_state.msgpack files. Exit 0 iff genotypes match.
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve(p: str) -> str:
    if p.endswith(".msgpack"):
        return p
    cands = sorted(glob.glob(os.path.join(p, "*", "search_state.msgpack")))
    cands += sorted(glob.glob(os.path.join(p, "search_state.msgpack")))
    if not cands:
        raise FileNotFoundError(f"no search_state.msgpack under {p}")
    return cands[-1]


def _load(p: str):
    import flax.serialization

    with open(p, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    genos = None
    meta_p = p + ".meta.json"
    if os.path.exists(meta_p):
        genos = json.load(open(meta_p)).get("genotypes")
    return raw["alphas"], genos


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def main() -> None:
    pa, pb = _resolve(sys.argv[1]), _resolve(sys.argv[2])
    aa, ga = _load(pa)
    ab, gb = _load(pb)
    same_geno = ga is not None and ga == gb
    print(f"A: {pa}\nB: {pb}")
    print(f"decoded genotypes: {'IDENTICAL' if same_geno else 'DIFFER'}")
    if not same_geno:
        print(f"  A: {ga}\n  B: {gb}")

    for stage in sorted(set(aa) | set(ab)):
        va, vb = np.asarray(aa[stage]), np.asarray(ab[stage])
        sa, sb = _softmax(va), _softmax(vb)
        cos = float(
            (sa.ravel() @ sb.ravel())
            / (np.linalg.norm(sa.ravel()) * np.linalg.norm(sb.ravel()) + 1e-30)
        )
        agree = float((sa.argmax(-1) == sb.argmax(-1)).mean())
        print(f"  {stage:8s} softmax cosine {cos:.5f}  argmax agreement {agree:.0%}")
    sys.exit(0 if same_geno else 1)


if __name__ == "__main__":
    main()
