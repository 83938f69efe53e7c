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
    sparse_pad_id: int | None = None,
):
    """Yield (triples [B,3] i32, labels, mask [B] f32).

    The final short batch is padded to ``batch_size`` (mask marks real
    rows) so every step hits the same compiled program.

    ``labels`` is the [B, num_ent] smoothed f32 multi-hot by default;
    ``raw_u8=True`` yields the UNsmoothed multi-hot as uint8 instead
    (4x fewer host->device bytes); ``sparse_pad_id`` yields the packed
    [B, K] object-id rows (:func:`pack_label_ids` — ~num_ent/K fewer
    bytes, K = max fan-out ~15 at FB15k-237 scale) for device-side
    reconstruction via :func:`labels_from_ids`. The caller applies
    smoothing on device either way (:func:`smooth_labels`).
    """
    n = len(qs)
    packed = (
        pack_label_ids(qs, sparse_pad_id) if sparse_pad_id is not None
        else None
    )
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
        if packed is not None:
            labels = packed[idx]
        elif raw_u8:
            labels = np.zeros((len(idx), num_ent), dtype=np.uint8)
            for i, j in enumerate(idx):
                labels[i, qs.labels[j]] = 1
        else:
            labels = multi_hot([qs.labels[i] for i in idx], num_ent, smooth)
        yield triples, labels, mask


def pack_label_ids(qs: QuerySet, pad_id: int) -> np.ndarray:
    """Pack the ragged per-query label lists into one [n, K] id matrix.

    K = the query set's max fan-out (a dataset constant — 15 on the
    FB15k-237-scale synthetic train set); absent slots hold ``pad_id``
    (callers use the label matrix's column count, so the device scatter
    lands pads in a throwaway column). This is the sparse wire form of
    the [B, num_ent] multi-hot: ~num_ent/K fewer host->device bytes per
    step, the dominant transfer of every lp-train step through a remote
    tunnel. Reconstruction (:func:`labels_from_ids`) is exact.

    Cached on the QuerySet after the first call.
    """
    cached = getattr(qs, "_packed", None)
    if cached is not None and cached[0] == pad_id:
        return cached[1]
    k = max((len(l) for l in qs.labels), default=1) or 1
    dt = np.uint16 if pad_id <= np.iinfo(np.uint16).max else np.int32
    out = np.full((len(qs.labels), k), pad_id, dtype=dt)
    for i, l in enumerate(qs.labels):
        out[i, : len(l)] = l
    qs._packed = (pad_id, out)
    return out


def labels_from_ids(obj_ids, n_cols: int):
    """Device-side inverse of :func:`pack_label_ids`: [B, K] padded id
    rows -> the exact [B, n_cols] 0/1 f32 multi-hot (pad slots carry the
    id ``n_cols`` and land in a throwaway column). Feed the result to
    :func:`smooth_labels` for the training target."""
    import jax.numpy as jnp

    b = obj_ids.shape[0]
    y = jnp.zeros((b, n_cols + 1), jnp.float32)
    y = y.at[
        jnp.arange(b, dtype=jnp.int32)[:, None], obj_ids.astype(jnp.int32)
    ].set(1.0)
    return y[:, :n_cols]


def labels_from_ids_cols(obj_ids, n_cols: int, col_start):
    """Column-sharded :func:`labels_from_ids` (TP analog): build only this
    device's entity-column block [col_start, col_start + n_cols) of the
    multi-hot; ids outside the block land in the throwaway column."""
    import jax.numpy as jnp

    ids = obj_ids.astype(jnp.int32) - col_start
    ids = jnp.where((ids >= 0) & (ids < n_cols), ids, n_cols)
    b = obj_ids.shape[0]
    y = jnp.zeros((b, n_cols + 1), jnp.float32)
    y = y.at[jnp.arange(b, dtype=jnp.int32)[:, None], ids].set(1.0)
    return y[:, :n_cols]


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
