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


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--dgl", choices=["aifb", "mutag", "bgs", "am"])
    g.add_argument("--edgelist", type=str)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    data = from_dgl(args.dgl) if args.dgl else from_edgelist(args.edgelist)
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
