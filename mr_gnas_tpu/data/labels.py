"""1-vs-N label construction for LP retrain (the CompGCN protocol).

Numpy port of utils/process_data.py:4-31 (``sr2o`` multi-hot label maps,
per-split head/tail query lists for filtered evaluation) and
utils/data_set.py:6-59 (label smoothing ``(1-eps)*y + 1/num_ent``),
emitting fixed-size device batches.
"""
from __future__ import annotations

import dataclasses
from collections import defaultdict

import numpy as np


@dataclasses.dataclass
class QuerySet:
    """Queries [n, 3] (s, r, o) with ragged per-query label lists."""

    triples: np.ndarray
    labels: list[np.ndarray]

    def __len__(self):
        return len(self.triples)


def process(dataset: dict[str, np.ndarray], num_rels: int) -> dict[str, QuerySet]:
    """Build train / {split}_{head,tail} query sets (process_data.py:4-31).

    ``train`` has one query per distinct (s, r) with train-only labels and
    a -1 object; head queries use relation ``r + num_rels``.
    """
    sr2o: dict[tuple[int, int], set[int]] = defaultdict(set)
    for s, r, o in dataset["train"]:
        sr2o[(int(s), int(r))].add(int(o))
        sr2o[(int(o), int(r) + num_rels)].add(int(s))
    sr2o_train = {k: sorted(v) for k, v in sr2o.items()}
    for split in ("valid", "test", "train"):
        for s, r, o in dataset[split]:
            sr2o[(int(s), int(r))].add(int(o))
            sr2o[(int(o), int(r) + num_rels)].add(int(s))
    sr2o_all = {k: sorted(v) for k, v in sr2o.items()}

    out: dict[str, QuerySet] = {}
    tr_triples, tr_labels = [], []
    for (s, r), objs in sr2o_train.items():
        tr_triples.append((s, r, -1))
        tr_labels.append(np.asarray(objs, dtype=np.int64))
    out["train"] = QuerySet(np.asarray(tr_triples, dtype=np.int64), tr_labels)

    for split in ("valid", "test", "train"):
        tail_t, tail_l, head_t, head_l = [], [], [], []
        for s, r, o in dataset[split]:
            s, r, o = int(s), int(r), int(o)
            tail_t.append((s, r, o))
            tail_l.append(np.asarray(sr2o_all[(s, r)], dtype=np.int64))
            head_t.append((o, r + num_rels, s))
            head_l.append(np.asarray(sr2o_all[(o, r + num_rels)], dtype=np.int64))
        out[f"{split}_tail"] = QuerySet(np.asarray(tail_t, dtype=np.int64), tail_l)
        out[f"{split}_head"] = QuerySet(np.asarray(head_t, dtype=np.int64), head_l)
    return out


def multi_hot(labels: list[np.ndarray], num_ent: int, smooth: float = 0.0):
    """Stack ragged label lists into a [B, num_ent] (optionally smoothed)
    multi-hot matrix.

    The smoothing is ``(1 - eps) * y + 1 / num_ent`` — note the constant
    ``1/num_ent`` term, faithful to utils/data_set.py:22 (and CompGCN),
    not the conventional ``eps/num_ent``.
    """
    y = np.zeros((len(labels), num_ent), dtype=np.float32)
    for i, l in enumerate(labels):
        y[i, l] = 1.0
    if smooth != 0.0:
        y = (1.0 - smooth) * y + 1.0 / num_ent
    return y


def iterate_batches(
    qs: QuerySet,
    num_ent: int,
    batch_size: int,
    smooth: float = 0.0,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    drop_last: bool = False,
    raw_u8: bool = False,
):
    """Yield (triples [B,3] i32, labels [B,num_ent] f32, mask [B] f32).

    The final short batch is padded to ``batch_size`` (mask marks real
    rows) so every step hits the same compiled program.

    ``raw_u8=True`` yields the UNsmoothed multi-hot as uint8 instead
    (4x fewer host->device bytes for the [B, num_ent] block — the
    transfer-heavy part of every lp-train step); the caller applies the
    smoothing on device: ``(1 - smooth) * y + 1/num_ent``
    (:func:`smooth_labels`, the same f32 arithmetic as
    :func:`multi_hot`).
    """
    n = len(qs)
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            pad = batch_size - len(idx)
            idx = np.concatenate([idx, np.zeros(pad, dtype=np.int64)])
            mask = np.concatenate(
                [np.ones(batch_size - pad, np.float32), np.zeros(pad, np.float32)]
            )
        else:
            mask = np.ones(batch_size, np.float32)
        triples = qs.triples[idx].astype(np.int32)
        if raw_u8:
            labels = np.zeros((len(idx), num_ent), dtype=np.uint8)
            for i, j in enumerate(idx):
                labels[i, qs.labels[j]] = 1
        else:
            labels = multi_hot([qs.labels[i] for i in idx], num_ent, smooth)
        yield triples, labels, mask


def smooth_labels(labels_u8, smooth: float, num_ent: int):
    """Device-side counterpart of :func:`multi_hot`'s smoothing for
    ``raw_u8`` batches: ``(1 - smooth) * y + 1/num_ent`` (the reference's
    constant-``1/num_ent`` quirk, utils/data_set.py:22), in f32. With
    ``smooth == 0`` it is just the cast. ``num_ent`` is the REAL entity
    count — padded label columns get the additive constant too, but every
    consumer masks them (bce col_mask / ranks use unsmoothed labels)."""
    y = labels_u8.astype("float32")
    if smooth == 0.0:
        return y
    return (1.0 - smooth) * y + 1.0 / num_ent
