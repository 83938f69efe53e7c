"""Link-prediction ranking metrics (filtered & raw) and result combining.

Replaces the reference's two eval paths with one vectorized formulation:
  * the retrain path's clamp-and-double-argsort ranking
    (train/mr_lp_train.py:295-308) becomes a rank-by-count: with distinct
    scores, ``rank = 1 + #{j != obj : pred[j] > pred[obj]}`` equals the
    double-argsort rank, costs O(N) instead of O(N log N), and shards
    cleanly across devices (a per-shard count + psum). Tied scores get
    the mid-tie rank ``1 + #greater + #other_ties/2`` — the expected
    value of the reference's index-order tie breaking — so a collapsed
    model whose scores are all equal ranks ~N/2, not 1;
  * the search path's per-triplet python loop over candidate entities
    (utils/utils_rgcn.py:296-340) becomes batched masked scoring.

Known-positive filtering clamps scores to -1e7 (train/mr_lp_train.py:298);
padded entity columns are clamped to -1e30 so they never outrank.
"""
from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

NEG_FILTER = -1e7
NEG_PAD = -1e30


@jax.jit
def filtered_ranks(pred: jax.Array, labels: jax.Array, obj: jax.Array, col_mask: jax.Array):
    """Ranks of ``obj`` in ``pred`` after filtering known positives.

    Args:
      pred:    [B, N] scores.
      labels:  [B, N] multi-hot known positives (including obj).
      obj:     [B] target entity per row.
      col_mask:[N] 1 for real entity columns, 0 for padding.
    Returns [B] float ranks (1-indexed).
    """
    b = pred.shape[0]
    brange = jnp.arange(b)
    target = pred[brange, obj]
    clamped = jnp.where(labels > 0.5, NEG_FILTER, pred)
    clamped = jnp.where(col_mask[None, :] > 0, clamped, NEG_PAD)
    clamped = clamped.at[brange, obj].set(target)
    greater = jnp.sum(clamped > target[:, None], axis=1)
    ties = jnp.sum(clamped == target[:, None], axis=1)  # includes obj itself
    rank = 1.0 + greater + 0.5 * (ties - 1)
    return rank.astype(jnp.float32)


def filtered_ranks_cols(
    pred: jax.Array,
    labels: jax.Array,
    obj: jax.Array,
    col_mask: jax.Array,
    model_axis: str,
):
    """:func:`filtered_ranks` over a *column shard* of the score matrix,
    inside ``shard_map`` — the TP-analog consumer of the sharded 1-vs-N
    decode (reference: the [B, num_ent] matmul at model_lp.py:135).

    Each device on ``model_axis`` holds contiguous entity columns
    ``[k*N_loc, (k+1)*N_loc)`` of its query rows; rank-by-count needs only
    two scalar-per-row psums (target pick + tie/greater counts), so the
    full score row never materializes on one device.

    Args:
      pred:     [B, N_loc] local column shard of the scores.
      labels:   [B, N_loc] matching column shard of known positives.
      obj:      [B] GLOBAL target entity ids (replicated over the axis).
      col_mask: [N_loc] local shard of the real-entity column mask.
      model_axis: mesh axis name the entity columns shard over.
    Returns [B] float ranks (1-indexed), replicated over ``model_axis``.
    """
    b, n_loc = pred.shape
    brange = jnp.arange(b)
    col_start = jax.lax.axis_index(model_axis) * n_loc
    loc = obj - col_start
    owned = (loc >= 0) & (loc < n_loc)
    loc_c = jnp.clip(loc, 0, n_loc - 1)
    target = jax.lax.psum(
        jnp.where(owned, pred[brange, loc_c], 0.0), model_axis
    )
    clamped = jnp.where(labels > 0.5, NEG_FILTER, pred)
    clamped = jnp.where(col_mask[None, :] > 0, clamped, NEG_PAD)
    # un-filter the target's own column on its owner shard
    cur = clamped[brange, loc_c]
    clamped = clamped.at[brange, loc_c].set(jnp.where(owned, target, cur))
    greater = jax.lax.psum(
        jnp.sum(clamped > target[:, None], axis=1), model_axis
    )
    ties = jax.lax.psum(  # includes obj itself (exactly once, owner shard)
        jnp.sum(clamped == target[:, None], axis=1), model_axis
    )
    rank = 1.0 + greater + 0.5 * (ties - 1)
    return rank.astype(jnp.float32)


def accumulate_rank_results(ranks: np.ndarray, results: dict | None = None, ks=(1, 3, 10)):
    """Accumulate count/mr/mrr/hits@k sums (train/mr_lp_train.py:304-308)."""
    results = results or {}
    ranks = np.asarray(ranks, dtype=np.float64)
    results["count"] = results.get("count", 0) + ranks.size
    results["mr"] = results.get("mr", 0.0) + ranks.sum()
    results["mrr"] = results.get("mrr", 0.0) + (1.0 / ranks).sum()
    for k in ks:
        results[f"hits@{k}"] = results.get(f"hits@{k}", 0) + int((ranks <= k).sum())
    return results


def combine_results(left: dict, right: dict, ks=(1, 3, 10)) -> dict:
    """Average head/tail-perturbed results (train/mr_lp_train.py:328-342)."""
    assert left["count"] == right["count"]
    count = float(left["count"])
    out = {
        "left_mr": round(left["mr"] / count, 5),
        "left_mrr": round(left["mrr"] / count, 5),
        "right_mr": round(right["mr"] / count, 5),
        "right_mrr": round(right["mrr"] / count, 5),
        "mr": round((left["mr"] + right["mr"]) / (2 * count), 5),
        "mrr": round((left["mrr"] + right["mrr"]) / (2 * count), 5),
    }
    for k in ks:
        out[f"left_hits@{k}"] = round(left[f"hits@{k}"] / count, 5)
        out[f"right_hits@{k}"] = round(right[f"hits@{k}"] / count, 5)
        out[f"hits@{k}"] = round((out[f"left_hits@{k}"] + out[f"right_hits@{k}"]) / 2, 5)
    return out


# ---------------------------------------------------------------------------
# search-side MRR over (ent_emb, rel_embed) with DistMult scoring
# (utils/utils_rgcn.py:212-380)
# ---------------------------------------------------------------------------


def _build_filter(train, valid, test, num_rels):
    """sr2o over all splits (tail direction) and or2s (head direction)."""
    tail = defaultdict(set)
    head = defaultdict(set)
    for split in (train, valid, test):
        for s, r, o in np.asarray(split):
            tail[(int(s), int(r))].add(int(o))
            head[(int(o), int(r))].add(int(s))
    return tail, head


class RankFilter:
    """Vectorized known-positive filter: per-(query, rel) label columns as
    a sorted CSR built ONCE per dataset.

    Replaces the per-triplet python loop over ``fmap[(q, r)]`` in the
    in-search eval (the O(test_size) host drag as test sets grow; the
    reference's equivalent loop is utils/utils_rgcn.py:296-340). Lookup
    is two ``np.searchsorted`` calls + one vectorized fill per batch.
    """

    def __init__(self, train, valid, test, num_rels_hint: int | None = None):
        trips = np.concatenate(
            [np.asarray(s).reshape(-1, 3) for s in (train, valid, test)]
        ).astype(np.int64)
        self._num_rel = (
            int(num_rels_hint)
            if num_rels_hint
            else (int(trips[:, 1].max()) + 1 if len(trips) else 1)
        )
        s, r, o = trips[:, 0], trips[:, 1], trips[:, 2]
        self._tail_keys, self._tail_vals = self._csr(s, r, o)
        self._head_keys, self._head_vals = self._csr(o, r, s)

    def _csr(self, q, r, tgt):
        keys = q * self._num_rel + r
        order = np.argsort(keys, kind="stable")
        return keys[order], tgt[order].astype(np.int64)

    def fill_labels(self, q, r, direction: str, n_cols: int) -> np.ndarray:
        """Multi-hot [B, n_cols] of known positives for each (q, r) row."""
        keys_s, vals = (
            (self._tail_keys, self._tail_vals)
            if direction == "tail"
            else (self._head_keys, self._head_vals)
        )
        q = np.asarray(q, np.int64)
        k = q * self._num_rel + np.asarray(r, np.int64)
        lo = np.searchsorted(keys_s, k, side="left")
        hi = np.searchsorted(keys_s, k, side="right")
        lens = hi - lo
        labels = np.zeros((len(q), n_cols), np.float32)
        total = int(lens.sum())
        if total:
            rows = np.repeat(np.arange(len(q)), lens)
            flat = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            cols = vals[np.repeat(lo, lens) + flat]
            labels[rows, cols] = 1.0
        return labels


@jax.jit
def _distmult_scores(ent_emb, rel_rows, q_emb):
    return jnp.dot(q_emb * rel_rows, ent_emb.T, preferred_element_type=jnp.float32)


def calc_mrr(
    ent_emb,
    rel_embed,
    train_triplets,
    valid_triplets,
    test_triplets,
    hits=(1, 3, 10),
    eval_bz: int = 512,
    eval_p: str = "filtered",
    num_ent: int | None = None,
    rank_filter: "RankFilter | None" = None,
):
    """MRR / MR / Hits@k of DistMult scores over the cell-stack embeddings
    (the in-search eval of search/mr_lp_search.py:258-278).

    Perturbs subject and object; ``filtered`` masks known positives.
    ``num_ent`` bounds the real entity columns when ent_emb is padded.
    ``rank_filter`` (a prebuilt :class:`RankFilter`) skips rebuilding the
    known-positive index on every eval call.
    """
    ent_emb = jnp.asarray(ent_emb)
    rel_embed = jnp.asarray(rel_embed)
    n_pad = ent_emb.shape[0]
    num_ent = num_ent or n_pad
    col_mask = jnp.asarray((np.arange(n_pad) < num_ent).astype(np.float32))
    test = np.asarray(test_triplets)
    if eval_p == "filtered" and rank_filter is None:
        rank_filter = RankFilter(train_triplets, valid_triplets, test)

    results: dict = {}
    for direction in ("tail", "head"):
        for start in range(0, len(test), eval_bz):
            batch = test[start : start + eval_bz]
            if direction == "tail":
                q, r, tgt = batch[:, 0], batch[:, 1], batch[:, 2]
            else:
                q, r, tgt = batch[:, 2], batch[:, 1], batch[:, 0]
            if eval_p == "filtered":
                labels = rank_filter.fill_labels(q, r, direction, n_pad)
            else:
                labels = np.zeros((len(batch), n_pad), np.float32)
            # DistMult is symmetric in (s, o): head-perturbed scores are
            # (o * r) . ent^T, so both directions use the same kernel
            scores = _distmult_scores(
                ent_emb, jnp.take(rel_embed, jnp.asarray(r), axis=0),
                jnp.take(ent_emb, jnp.asarray(q), axis=0),
            )
            ranks = filtered_ranks(
                scores, jnp.asarray(labels), jnp.asarray(tgt), col_mask
            )
            results = accumulate_rank_results(np.asarray(ranks), results, hits)

    count = results["count"]
    mrr = results["mrr"] / count
    hit_k = [results[f"hits@{k}"] / count for k in hits]
    return float(mrr), [float(h) for h in hit_k]
