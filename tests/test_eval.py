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


def test_rank_filter_matches_dict_build(rng):
    """Vectorized RankFilter labels == the per-triplet dict loop."""
    from mr_gnas_tpu.train.eval import RankFilter, _build_filter

    n_ent, n_rel = 25, 5
    def mk(k):
        return np.stack(
            [rng.integers(0, n_ent, k), rng.integers(0, n_rel, k), rng.integers(0, n_ent, k)], 1
        )

    train, valid, test = mk(80), mk(20), mk(30)
    rf = RankFilter(train, valid, test)
    tail_f, head_f = _build_filter(train, valid, test, None)
    n_pad = n_ent + 3
    for direction, fmap in (("tail", tail_f), ("head", head_f)):
        q = test[:, 0] if direction == "tail" else test[:, 2]
        r = test[:, 1]
        got = rf.fill_labels(q, r, direction, n_pad)
        want = np.zeros((len(test), n_pad), np.float32)
        for i, (qq, rr) in enumerate(zip(q, r)):
            want[i, sorted(fmap[(int(qq), int(rr))])] = 1.0
        np.testing.assert_array_equal(got, want)


def test_rank_filter_empty_and_duplicate_keys():
    from mr_gnas_tpu.train.eval import RankFilter

    train = np.array([[0, 0, 1], [0, 0, 1], [0, 0, 2]])  # duplicates
    rf = RankFilter(train, train[:0], train[:0])
    lab = rf.fill_labels([0, 7], [0, 0], "tail", 10)
    np.testing.assert_array_equal(lab[0, [1, 2]], [1.0, 1.0])
    assert lab[0].sum() == 2.0
    assert lab[1].sum() == 0.0  # unseen (q, r) -> empty
