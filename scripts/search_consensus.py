"""Multi-seed search consensus (VERDICT r4 item 4).

Reads N search run dirs (genotypes.json), prints the per-gene agreement
table across seeds, and emits the per-gene MAJORITY genotype (ties
broken toward the seed-0 gene). The builder's own seed-variance study
(NOTES round-4: 3/20 genes flip across seeds at 500 steps) says a
single-seed genotype claim is under-determined; the consensus genotype
is what flows into the retrain comparison.

Usage:
    python scripts/search_consensus.py run_dir1 run_dir2 ... [--out F]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_genos(path: str):
    if os.path.isdir(path):
        hits = glob.glob(os.path.join(path, "**", "genotypes.json"),
                         recursive=True)
        assert hits, f"no genotypes.json under {path}"
        path = sorted(hits)[-1]
    with open(path) as f:
        return json.load(f), path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--out", default="")
    ap.add_argument("--score-func", default="",
                    help="override score_func on the consensus output")
    args = ap.parse_args()

    seeds = []
    for r in args.runs:
        genos, src = load_genos(r)
        seeds.append(genos)
        print(f"loaded {src}")
    n_layers = len(seeds[0])
    assert all(len(s) == n_layers for s in seeds)

    consensus = []
    agree_total = gene_total = 0
    for li in range(n_layers):
        cells = [s[li]["alpha_cell"] for s in seeds]
        n_genes = len(cells[0])
        out_cell = []
        for gi in range(n_genes):
            votes = collections.Counter(
                (c[gi][0], c[gi][1], c[gi][2]) for c in cells
            )
            top, cnt = votes.most_common(1)[0]
            # tie -> seed-0's gene (listed order is deterministic)
            ties = [g for g, c in votes.items() if c == cnt]
            if len(ties) > 1:
                top = tuple(cells[0][gi])
                cnt = votes[top]
            agree_total += cnt
            gene_total += len(seeds)
            mark = "" if cnt == len(seeds) else f"  <- {cnt}/{len(seeds)}"
            print(f"L{li} gene{gi}: {dict(votes)}{mark}")
            out_cell.append(list(top))
        consensus.append({
            "alpha_cell": out_cell,
            "concat_node": seeds[0][li]["concat_node"],
            "score_func": args.score_func or seeds[0][li].get("score_func"),
        })
    print(f"\nper-gene agreement: {agree_total}/{gene_total} "
          f"({100 * agree_total / gene_total:.0f}%)")
    js = json.dumps(consensus)
    print("consensus genotype:", js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js)
        print("written to", args.out)


if __name__ == "__main__":
    main()
