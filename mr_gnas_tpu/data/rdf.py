"""Node-classification datasets (RDF-style multi-relational graphs).

The reference loads AIFB/MUTAG/BGS/AM through DGL's RDF dataset classes
and converts to a homogeneous typed graph (utils/utils.py:182-263). This
module provides the same post-conversion abstraction as plain arrays:

  * an ``.npz`` loader for preprocessed homogeneous graphs (fields:
    ``src, dst, etype, num_nodes, num_rels, num_classes, target_ids,
    labels, train_idx, test_idx``) — the artifact a one-off RDF
    preprocessing script produces;
  * a deterministic synthetic generator for tests and benchmarks whose
    labels are a function of neighborhood relation structure (learnable).

The 50/50 train/val split for search (``--valid``) mirrors
utils/utils.py:217-223.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class NCDataset:
    name: str
    num_nodes: int
    num_rels: int
    num_classes: int
    src: np.ndarray  # [E] homogeneous edges
    dst: np.ndarray
    etype: np.ndarray
    target_ids: np.ndarray  # [n_target] global node ids of the predict type
    labels: np.ndarray  # [n_target] class per target node
    train_idx: np.ndarray  # indices into target_ids
    test_idx: np.ndarray

    def search_split(self):
        """(train_idx, val_idx) — half/half as in utils/utils.py:217-223."""
        val = self.train_idx[: len(self.train_idx) // 2]
        train = self.train_idx[len(self.train_idx) // 2 :]
        return train, val


def load_nc_npz(path: str, name: str | None = None) -> NCDataset:
    z = np.load(path)
    return NCDataset(
        name=name or os.path.basename(path),
        num_nodes=int(z["num_nodes"]),
        num_rels=int(z["num_rels"]),
        num_classes=int(z["num_classes"]),
        src=z["src"].astype(np.int64),
        dst=z["dst"].astype(np.int64),
        etype=z["etype"].astype(np.int64),
        target_ids=z["target_ids"].astype(np.int64),
        labels=z["labels"].astype(np.int64),
        train_idx=z["train_idx"].astype(np.int64),
        test_idx=z["test_idx"].astype(np.int64),
    )


def synthetic_nc(
    num_nodes: int = 300,
    num_rels: int = 8,
    num_classes: int = 4,
    n_target: int = 80,
    avg_degree: int = 6,
    seed: int = 0,
) -> NCDataset:
    """Synthetic typed graph where a target node's class is determined by
    the majority relation type of its in-edges — a signal a 1-layer
    relational aggregator can learn."""
    rng = np.random.default_rng(seed)
    target_ids = rng.choice(num_nodes, size=n_target, replace=False)
    labels = rng.integers(0, num_classes, size=n_target)

    srcs, dsts, ets = [], [], []
    # class-correlated in-edges for target nodes
    rel_of_class = (np.arange(num_classes) * max(1, num_rels // num_classes)) % num_rels
    for t, y in zip(target_ids, labels):
        k = rng.integers(avg_degree // 2 + 1, avg_degree + 3)
        for _ in range(k):
            srcs.append(rng.integers(num_nodes))
            dsts.append(t)
            # mostly the class's relation, some noise
            if rng.uniform() < 0.8:
                ets.append(rel_of_class[y])
            else:
                ets.append(rng.integers(num_rels))
    # background edges
    n_bg = num_nodes * avg_degree // 2
    srcs.extend(rng.integers(num_nodes, size=n_bg))
    dsts.extend(rng.integers(num_nodes, size=n_bg))
    ets.extend(rng.integers(num_rels, size=n_bg))

    order = rng.permutation(len(target_ids))
    n_train = int(0.7 * len(order))
    return NCDataset(
        name="synthetic_nc",
        num_nodes=num_nodes,
        num_rels=num_rels,
        num_classes=num_classes,
        src=np.asarray(srcs, np.int64),
        dst=np.asarray(dsts, np.int64),
        etype=np.asarray(ets, np.int64),
        target_ids=target_ids,
        labels=labels,
        train_idx=order[:n_train],
        test_idx=order[n_train:],
    )


def load_nc_dataset(name_or_path: str, data_root: str = "data") -> NCDataset:
    if name_or_path == "synthetic":
        return synthetic_nc()
    if os.path.isfile(name_or_path):
        return load_nc_npz(name_or_path)
    cand = os.path.join(data_root, f"{name_or_path}.npz")
    if os.path.isfile(cand):
        return load_nc_npz(cand, name=name_or_path)
    raise FileNotFoundError(
        f"NC dataset {name_or_path!r} not found (looked for {cand!r}); "
        "preprocess the RDF dataset into the documented .npz format"
    )
