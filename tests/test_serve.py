"""Serving: Predictor from checkpoint scores and retrieves correctly."""
import os

import numpy as np

from mr_gnas_tpu.serve import Predictor
from mr_gnas_tpu.train import LPTrainConfig, run_lp_train
import pytest

GENO = (
    "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
)


@pytest.mark.slow
def test_predictor_from_checkpoint(tmp_path):
    cfg = LPTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=GENO,
    )
    out = run_lp_train(cfg)
    ckpt = os.path.join(out["run_dir"], "model_best_mrr.msgpack")
    pred = Predictor.from_checkpoint(ckpt, cfg)

    subj = np.array([0, 1, 2])
    rel = np.array([0, 1, 2])
    s = np.asarray(pred.scores(subj, rel))
    assert s.shape[0] == 3 and s.shape[1] >= 3
    assert np.all((s >= 0) & (s <= 1))
    vals, idx = pred.topk(subj, rel, k=5)
    assert vals.shape == (3, 5) and idx.shape == (3, 5)
    # topk really is the argmax prefix
    np.testing.assert_array_equal(idx[:, 0], s.argmax(axis=1))
    assert np.all(np.diff(vals, axis=1) <= 1e-7)

    # from_checkpoint with a mesh: the served table is row-sharded over
    # 'model' and the scores are unchanged (tests/test_tp.py covers the
    # direct-constructor path; this covers the checkpoint + graph-pad
    # path the CLI lp-predict --mesh-shape uses)
    from mr_gnas_tpu.dist import make_mesh

    mesh = make_mesh((8,), ("model",))
    pred8 = Predictor.from_checkpoint(ckpt, cfg, mesh=mesh)
    shards = {sh.data.shape[0] for sh in pred8.ent_emb.addressable_shards}
    assert shards == {pred8.ent_emb.shape[0] // 8}
    s8 = np.asarray(pred8.scores(subj, rel))
    np.testing.assert_allclose(s8[:, : s.shape[1]], s, rtol=2e-5, atol=2e-6)
    # padded entity columns (graph pads to a multiple of 8) never rank
    _, idx8 = pred8.topk(subj, rel, k=5)
    np.testing.assert_array_equal(idx8, idx)
