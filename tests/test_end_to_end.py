"""The full NAS pipeline: search -> genotype decode -> retrain.

Mirrors the reference's search-to-retrain hand-off (SURVEY.md §3.5) but
through JSON genotype artifacts instead of log-scraped strings.
"""
import json
import os

import pytest

pytestmark = pytest.mark.slow

from mr_gnas_tpu.cells import genotypes_to_json
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


@pytest.mark.smoke
def test_lp_search_to_retrain(tmp_path):
    search_cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=40,
        graph_batch_size_val=20,
        negative_sample=3,
        warm_epochs=1,
        epochs=4,
        layers=1,
    )
    out = run_lp_search(search_cfg)
    geno_file = os.path.join(out["run_dir"], "genotypes.json")
    with open(geno_file) as f:
        geno_json = f.read()
    # the decoded genotype retrains directly
    train_cfg = LPTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=geno_json,
    )
    res = run_lp_train(train_cfg)
    assert 0.0 <= res["test"]["mrr"] <= 1.0


@pytest.mark.smoke
def test_nc_search_to_retrain(tmp_path):
    search_cfg = NCSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=16,
        warm_epochs=0,
        epochs=2,
        layers=1,
    )
    out = run_nc_search(search_cfg)
    train_cfg = NCTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=3,
        layers=1,
        genotype=genotypes_to_json(out["genotypes"]),
        optimizer="adam",
    )
    res = run_nc_train(train_cfg)
    assert res["best"]["test_acc"] >= 0.0
