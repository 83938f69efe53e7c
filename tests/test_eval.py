"""Ranking metrics vs brute-force oracles."""
import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.train.eval import (
    accumulate_rank_results,
    calc_mrr,
    combine_results,
    filtered_ranks,
)


def test_filtered_ranks_matches_double_argsort(rng):
    b, n = 16, 40
    pred = rng.normal(size=(b, n)).astype(np.float32)
    obj = rng.integers(0, n, size=b)
    labels = (rng.uniform(size=(b, n)) < 0.2).astype(np.float32)
    labels[np.arange(b), obj] = 1.0
    col_mask = np.ones(n, np.float32)

    got = np.asarray(
        filtered_ranks(jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(obj), jnp.asarray(col_mask))
    )
    # oracle: the reference's clamp + double argsort (train/mr_lp_train.py:295-308)
    target = pred[np.arange(b), obj].copy()
    clamped = np.where(labels > 0.5, -1e7, pred)
    clamped[np.arange(b), obj] = target
    order = np.argsort(-clamped, axis=1)
    ranks = np.empty_like(order)
    rows = np.arange(b)[:, None]
    ranks[rows, order] = np.arange(n)[None, :]
    want = 1 + ranks[np.arange(b), obj]
    np.testing.assert_array_equal(got, want)


def test_filtered_ranks_ignores_padded_columns(rng):
    pred = np.array([[0.9, 0.5, 5.0, 7.0]], np.float32)  # cols 2,3 padding
    labels = np.zeros((1, 4), np.float32)
    col_mask = np.array([1, 1, 0, 0], np.float32)
    r = filtered_ranks(jnp.asarray(pred), jnp.asarray(labels), jnp.asarray([0]), jnp.asarray(col_mask))
    assert float(r[0]) == 1.0


def test_combine_results():
    l = accumulate_rank_results(np.array([1.0, 2.0]))
    r = accumulate_rank_results(np.array([4.0, 1.0]))
    out = combine_results(l, r)
    assert out["mr"] == 2.0
    np.testing.assert_allclose(out["mrr"], (1 + 0.5 + 0.25 + 1) / 4, rtol=1e-6)
    assert out["hits@1"] == 0.5
    assert out["left_hits@1"] == 0.5 and out["right_hits@1"] == 0.5


def test_calc_mrr_perfect_embeddings():
    """Embeddings constructed so the true object scores highest."""
    n, d = 12, 12
    ent = np.eye(n, d, dtype=np.float32)
    rel = np.ones((3, d), np.float32)
    test = np.array([[0, 0, 0], [5, 1, 5]])  # (s, r, o=s): ent[s]*rel ~ one-hot s
    mrr, hits = calc_mrr(ent, rel, test, test, test, eval_p="filtered")
    assert mrr == 1.0
    assert hits[0] == 1.0


def test_calc_mrr_filtered_beats_raw(rng):
    n, d = 30, 8
    ent = rng.normal(size=(n, d)).astype(np.float32)
    rel = rng.normal(size=(4, d)).astype(np.float32)
    # many shared (s, r) positives -> filtering must improve (or equal) MRR
    train = np.stack(
        [rng.integers(0, n, 60), rng.integers(0, 4, 60), rng.integers(0, n, 60)], 1
    )
    test = train[:10]
    mrr_f, _ = calc_mrr(ent, rel, train, train[:0], test, eval_p="filtered")
    mrr_r, _ = calc_mrr(ent, rel, train, train[:0], test, eval_p="raw")
    assert mrr_f >= mrr_r - 1e-9


def test_filtered_ranks_mid_tie_on_collapsed_scores():
    """All-equal scores (a collapsed model) must rank mid-list, not 1st.

    Expected rank of the target under the reference's index-order tie
    breaking averaged over orders: 1 + (n-1)/2.
    """
    n = 10
    pred = np.zeros((1, n), np.float32)
    labels = np.zeros((1, n), np.float32)
    labels[0, 3] = 1.0
    col_mask = np.ones(n, np.float32)
    r = filtered_ranks(jnp.asarray(pred), jnp.asarray(labels), jnp.asarray([3]), jnp.asarray(col_mask))
    assert float(r[0]) == 1 + (n - 1) / 2


def test_filtered_ranks_partial_ties():
    pred = np.array([[2.0, 1.0, 1.0, 1.0, 0.0]], np.float32)
    labels = np.zeros((1, 5), np.float32)
    labels[0, 2] = 1.0
    col_mask = np.ones(5, np.float32)
    r = filtered_ranks(jnp.asarray(pred), jnp.asarray(labels), jnp.asarray([2]), jnp.asarray(col_mask))
    # one strictly greater + two other ties -> 1 + 1 + 2/2 = 3
    assert float(r[0]) == 3.0
