"""Smoke-test the four drivers end-to-end on synthetic data (few steps)."""
import json
import os

import numpy as np
import pytest

from mr_gnas_tpu.train import (
    LPSearchConfig,
    LPTrainConfig,
    NCSearchConfig,
    NCTrainConfig,
    run_lp_search,
    run_lp_train,
    run_nc_search,
    run_nc_train,
)

GENO_LP = (
    "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
)
GENO_NC = (
    "[Genotype(alpha_cell=[('pre_mult', 1, 0), ('f_dense', 2, 1), "
    "('f_identity', 3, 2), ('a_max', 4, 2), ('a_sum', 5, 3), "
    "('f_identity', 6, 5), ('f_dense_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func=None)]"
)


def test_lp_search_driver(tmp_path):
    cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=40,
        graph_batch_size_val=20,
        negative_sample=3,
        warm_epochs=2,
        log_every=2,
        epochs=6,
        layers=1,
    )
    out = run_lp_search(cfg)
    assert len(out["genotypes"]) == 1
    assert os.path.exists(os.path.join(out["run_dir"], "genotypes.json"))
    assert os.path.exists(os.path.join(out["run_dir"], "search_state.msgpack"))
    assert np.isfinite(out["last_loss"])


def test_lp_search_driver_unrolled(tmp_path):
    cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=30,
        graph_batch_size_val=16,
        negative_sample=2,
        warm_epochs=1,
        epochs=3,
        layers=1,
        unrolled=True,
        hvp_mode="fd",
    )
    out = run_lp_search(cfg)
    assert np.isfinite(out["last_loss"])


def test_lp_train_driver(tmp_path):
    cfg = LPTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=2,
        genotype=GENO_LP,
        embed_dim=16,
        num_filt=4,
        ker_sz=3,
        k_w=4,
        k_h=4,
        log_every=1,
    )
    out = run_lp_train(cfg)
    assert 0.0 <= out["test"]["mrr"] <= 1.0
    assert out["test"]["hits@10"] >= out["test"]["hits@1"]
    # scalars stream exists and parses
    with open(os.path.join(out["run_dir"], "scalars.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("test_mrr" in r for r in recs)


def test_lp_train_resume(tmp_path):
    cfg = LPTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=8,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=GENO_LP,
    )
    out = run_lp_train(cfg)
    ckpt = os.path.join(out["run_dir"], "model_best_mrr.msgpack")
    assert os.path.exists(ckpt)
    cfg2 = cfg.replace(checkpoint=ckpt, epochs=2)
    out2 = run_lp_train(cfg2)
    assert out2["best"]["mrr"] >= 0.0


def test_nc_search_driver(tmp_path):
    cfg = NCSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=16,
        warm_epochs=1,
        epochs=3,
        layers=1,
        log_every=1,
    )
    out = run_nc_search(cfg)
    assert len(out["genotypes"]) == 1


def test_nc_train_driver(tmp_path):
    cfg = NCTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=8,
        layers=1,
        genotype=GENO_NC,
        optimizer="adam",
        learning_rate=5e-3,
        log_every=4,
    )
    out = run_nc_train(cfg)
    assert out["best"]["test_acc"] > 0.2  # learnable synthetic task
