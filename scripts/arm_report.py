"""Retrain-arm comparison report (VERDICT r4 item 2).

Reads each arm's run dir (scalars.jsonl), reports the best-val-epoch
test MRR (the reference's model-selection rule: best checkpoint by
validation, train/mr_lp_train.py:193-201), the final-epoch numbers, and
a per-eval-epoch trajectory table across arms — so truncated arms are
comparable at their last COMMON eval epoch.

Usage: python scripts/arm_report.py artifacts/r5/arm-*
"""
from __future__ import annotations

import glob
import json
import os
import sys


def load(run):
    hits = sorted(glob.glob(os.path.join(run, "**", "scalars.jsonl"),
                            recursive=True))
    if not hits:
        return None
    rows = {}
    with open(hits[-1]) as f:
        for line in f:
            r = json.loads(line)
            rows.setdefault(r["step"], {}).update(r)
    evals = {e: r for e, r in rows.items() if "val_mrr" in r}
    return evals


def main():
    arms = sys.argv[1:]
    data = {}
    for a in arms:
        evals = load(a)
        if evals:
            data[os.path.basename(a.rstrip("/"))] = evals
    if not data:
        print("no arm data found")
        return
    all_epochs = sorted({e for ev in data.values() for e in ev})
    common = sorted(set.intersection(*[set(ev) for ev in data.values()]))
    names = sorted(data)
    print("eval-epoch trajectory (test_mrr):")
    print("epoch  " + "  ".join(f"{n:>24s}" for n in names))
    for e in all_epochs:
        cells = [
            f"{data[n][e]['test_mrr']:.4f}" if e in data[n] else "-"
            for n in names
        ]
        print(f"{e:5d}  " + "  ".join(f"{c:>24s}" for c in cells))
    print()
    for n in names:
        ev = data[n]
        best_e = max(ev, key=lambda e: ev[e]["val_mrr"])
        last_e = max(ev)
        print(
            f"{n}: best-val epoch {best_e} -> val {ev[best_e]['val_mrr']:.4f} "
            f"test {ev[best_e]['test_mrr']:.4f} "
            f"h@10 {ev[best_e].get('test_hits10', float('nan')):.4f} | "
            f"final epoch {last_e} test {ev[last_e]['test_mrr']:.4f}"
        )
    if common:
        e = common[-1]
        print(f"\nlast common eval epoch: {e}")
        for n in names:
            print(f"  {n}: test_mrr {data[n][e]['test_mrr']:.4f}")


if __name__ == "__main__":
    main()
