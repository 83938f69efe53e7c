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
):
    """MRR / MR / Hits@k of DistMult scores over the cell-stack embeddings
    (the in-search eval of search/mr_lp_search.py:258-278).

    Perturbs subject and object; ``filtered`` masks known positives.
    ``num_ent`` bounds the real entity columns when ent_emb is padded.
    """
    ent_emb = jnp.asarray(ent_emb)
    rel_embed = jnp.asarray(rel_embed)
    n_pad = ent_emb.shape[0]
    num_ent = num_ent or n_pad
    col_mask = jnp.asarray((np.arange(n_pad) < num_ent).astype(np.float32))
    test = np.asarray(test_triplets)
    tail_f, head_f = _build_filter(train_triplets, valid_triplets, test, None)

    results: dict = {}
    for direction in ("tail", "head"):
        for start in range(0, len(test), eval_bz):
            batch = test[start : start + eval_bz]
            if direction == "tail":
                q, r, tgt = batch[:, 0], batch[:, 1], batch[:, 2]
                fmap = tail_f
            else:
                q, r, tgt = batch[:, 2], batch[:, 1], batch[:, 0]
                fmap = head_f
            labels = np.zeros((len(batch), n_pad), np.float32)
            if eval_p == "filtered":
                for i, (qq, rr) in enumerate(zip(q, r)):
                    labels[i, sorted(fmap[(int(qq), int(rr))])] = 1.0
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
