#!/usr/bin/env python
"""Preprocess an RDF node-classification dataset into the .npz contract.

The framework's NC loaders (mr_gnas_tpu/data/rdf.py) consume a
homogeneous typed-graph .npz with fields::

    src, dst, etype            [E] int64 homogeneous edges
    num_nodes, num_rels, num_classes   scalars
    target_ids                 [n_target] global node ids of the predict type
    labels                     [n_target] class ids
    train_idx, test_idx        indices into target_ids

This script produces that file from either:

  * a DGL RDF dataset (aifb/mutag/bgs/am) — requires ``dgl`` installed
    (the reference's own dependency); replicates utils/utils.py:182-263's
    hetero->homogeneous conversion; or
  * a generic edge-list directory: ``edges.tsv`` (src\trel\tdst with
    string ids), ``labels.tsv`` (node\tclass), ``train.txt``/``test.txt``
    (node ids, one per line).

Usage:
    python scripts/preprocess_rdf.py --dgl aifb --out data/aifb.npz
    python scripts/preprocess_rdf.py --edgelist path/dir --out data/custom.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def from_dgl(name: str) -> dict:
    import dgl  # the reference's dependency; not bundled here
    import torch

    ds = {
        "aifb": dgl.data.AIFBDataset,
        "mutag": dgl.data.MUTAGDataset,
        "bgs": dgl.data.BGSDataset,
        "am": dgl.data.AMDataset,
    }[name]()
    hg = ds[0]
    num_rels = len(hg.canonical_etypes)
    category = ds.predict_category
    train_mask = hg.nodes[category].data.pop("train_mask")
    test_mask = hg.nodes[category].data.pop("test_mask")
    labels = hg.nodes[category].data.pop("labels").numpy()
    train_idx = torch.nonzero(train_mask, as_tuple=False).squeeze().numpy()
    test_idx = torch.nonzero(test_mask, as_tuple=False).squeeze().numpy()

    category_id = list(hg.ntypes).index(category)
    g = dgl.to_homogeneous(hg)
    src, dst = (x.numpy() for x in g.edges())
    etype = g.edata[dgl.ETYPE].numpy()
    node_tids = g.ndata[dgl.NTYPE].numpy()
    target_ids = np.where(node_tids == category_id)[0]
    return dict(
        src=src.astype(np.int64),
        dst=dst.astype(np.int64),
        etype=etype.astype(np.int64),
        num_nodes=g.number_of_nodes(),
        num_rels=num_rels,
        num_classes=ds.num_classes,
        target_ids=target_ids.astype(np.int64),
        labels=labels.astype(np.int64),
        train_idx=train_idx.astype(np.int64),
        test_idx=test_idx.astype(np.int64),
    )


def from_edgelist(path: str) -> dict:
    ent2id: dict[str, int] = {}
    rel2id: dict[str, int] = {}

    def get(d, k):
        if k not in d:
            d[k] = len(d)
        return d[k]

    src, dst, etype = [], [], []
    with open(os.path.join(path, "edges.tsv")) as f:
        for line in f:
            s, r, o = line.rstrip("\n").split("\t")
            src.append(get(ent2id, s))
            etype.append(get(rel2id, r))
            dst.append(get(ent2id, o))

    label_map: dict[int, int] = {}
    cls2id: dict[str, int] = {}
    with open(os.path.join(path, "labels.tsv")) as f:
        for line in f:
            n, c = line.rstrip("\n").split("\t")
            label_map[get(ent2id, n)] = get(cls2id, c)
    target_ids = np.asarray(sorted(label_map), np.int64)
    labels = np.asarray([label_map[n] for n in target_ids], np.int64)
    pos = {int(n): i for i, n in enumerate(target_ids)}

    def read_split(fn):
        with open(os.path.join(path, fn)) as f:
            return np.asarray(
                [pos[get(ent2id, l.strip())] for l in f if l.strip()], np.int64
            )

    return dict(
        src=np.asarray(src, np.int64),
        dst=np.asarray(dst, np.int64),
        etype=np.asarray(etype, np.int64),
        num_nodes=len(ent2id),
        num_rels=len(rel2id),
        num_classes=len(cls2id),
        target_ids=target_ids,
        labels=labels,
        train_idx=read_split("train.txt"),
        test_idx=read_split("test.txt"),
    )


_NT_RE = None


def _parse_nt_line(line: str):
    """Parse one N-Triples line -> (s, p, o, o_is_literal) or None.

    Handles ``<uri>``, ``_:blank`` terms and quoted literals (with
    optional ^^type / @lang suffixes). Comments and blank lines -> None.
    """
    global _NT_RE
    import re

    if _NT_RE is None:
        term = r"(<[^>]*>|_:\S+)"
        lit = r'("(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?)'
        _NT_RE = re.compile(
            rf"^\s*{term}\s+<([^>]*)>\s+(?:{term}|{lit})\s*\.\s*$"
        )
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    m = _NT_RE.match(line)
    if not m:
        return None
    s, p, o_term, o_lit = m.group(1), m.group(2), m.group(3), m.group(4)
    if o_lit is not None:
        return s.strip("<>"), p, o_lit, True
    return s.strip("<>"), p, o_term.strip("<>"), False


def from_ntriples(
    nt_paths: list[str],
    train_tsv: str,
    test_tsv: str,
    target_col: str,
    label_col: str,
    keep_literals: bool = False,
) -> dict:
    """DGL-free RDF entity-classification ingestion (AIFB-style layout:
    one or more .nt graph dumps + trainingSet/testSet TSVs naming the
    target entities and their class label).

    Replicates the shape of the reference's DGL RDF path
    (utils/utils.py:182-263 after to_homogeneous): URI/blank-node terms
    become entities, predicates become relations, literal-valued triples
    are dropped unless ``keep_literals``.
    """
    ent2id: dict[str, int] = {}
    rel2id: dict[str, int] = {}

    def get(d, k):
        if k not in d:
            d[k] = len(d)
        return d[k]

    src, dst, etype = [], [], []
    n_lit_dropped = 0
    for path in nt_paths:
        with open(path, errors="replace") as f:
            for line in f:
                parsed = _parse_nt_line(line)
                if parsed is None:
                    continue
                s, p, o, is_lit = parsed
                if is_lit and not keep_literals:
                    n_lit_dropped += 1
                    continue
                src.append(get(ent2id, s))
                etype.append(get(rel2id, p))
                dst.append(get(ent2id, o))
    if n_lit_dropped:
        print(f"dropped {n_lit_dropped} literal-valued triples")

    cls2id: dict[str, int] = {}

    def read_tsv(path):
        import csv

        rows = []
        with open(path) as f:
            rd = csv.DictReader(f, delimiter="\t")
            for row in rd:
                uri = row[target_col].strip().strip("<>")
                if uri not in ent2id:
                    # target entity never appears in the graph: register it
                    get(ent2id, uri)
                rows.append((ent2id[uri], get(cls2id, row[label_col].strip())))
        return rows

    train_rows = read_tsv(train_tsv)
    test_rows = read_tsv(test_tsv)
    label_map = dict(train_rows + test_rows)
    target_ids = np.asarray(sorted(label_map), np.int64)
    pos = {int(n): i for i, n in enumerate(target_ids)}
    labels = np.asarray([label_map[n] for n in target_ids], np.int64)
    return dict(
        src=np.asarray(src, np.int64),
        dst=np.asarray(dst, np.int64),
        etype=np.asarray(etype, np.int64),
        num_nodes=len(ent2id),
        num_rels=len(rel2id),
        num_classes=len(cls2id),
        target_ids=target_ids,
        labels=labels,
        train_idx=np.asarray([pos[n] for n, _ in train_rows], np.int64),
        test_idx=np.asarray([pos[n] for n, _ in test_rows], np.int64),
    )


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--dgl", choices=["aifb", "mutag", "bgs", "am"])
    g.add_argument("--edgelist", type=str)
    g.add_argument("--nt", nargs="+", help="N-Triples file(s) (DGL-free RDF path)")
    ap.add_argument("--train-tsv")
    ap.add_argument("--test-tsv")
    ap.add_argument("--target-col", default="person")
    ap.add_argument("--label-col", default="label_affiliation")
    ap.add_argument("--keep-literals", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.dgl:
        data = from_dgl(args.dgl)
    elif args.edgelist:
        data = from_edgelist(args.edgelist)
    else:
        if not (args.train_tsv and args.test_tsv):
            ap.error("--nt requires --train-tsv and --test-tsv")
        data = from_ntriples(
            args.nt, args.train_tsv, args.test_tsv,
            args.target_col, args.label_col, args.keep_literals,
        )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **data)
    print(
        f"wrote {args.out}: {data['num_nodes']} nodes, "
        f"{len(data['src'])} edges, {data['num_rels']} rels, "
        f"{data['num_classes']} classes, {len(data['target_ids'])} targets"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
