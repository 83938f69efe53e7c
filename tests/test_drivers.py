"""Smoke-test the four drivers end-to-end on synthetic data (few steps)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


@pytest.mark.smoke
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
        eval_every=3,  # exercise the in-search filtered-MRR path
    )
    out = run_lp_search(cfg)
    assert len(out["genotypes"]) == 1
    assert os.path.exists(os.path.join(out["run_dir"], "genotypes.json"))
    assert os.path.exists(os.path.join(out["run_dir"], "search_state.msgpack"))
    assert np.isfinite(out["last_loss"])
    # the in-search eval logged a test_mrr scalar
    with open(os.path.join(out["run_dir"], "scalars.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("test_mrr" in r for r in recs)


def test_lp_search_profile_trace(tmp_path):
    cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=8,
        init_fea_dim=8,
        num_base_r=4,
        graph_batch_size=20,
        graph_batch_size_val=12,
        negative_sample=2,
        warm_epochs=1,
        epochs=6,
        layers=1,
        profile_steps=2,
    )
    out = run_lp_search(cfg)
    prof = os.path.join(out["run_dir"], "profile")
    assert os.path.isdir(prof) and any(os.scandir(prof))


def test_lp_search_resume_exact(tmp_path):
    """Interrupted search continues bit-exactly: run 4 epochs straight vs
    2 epochs + resume for 2 more — identical final loss and genotypes."""
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=30,
        graph_batch_size_val=16,
        negative_sample=2,
        warm_epochs=1,
        epochs=4,
        layers=1,
        max_patience=99,
    )
    out_full = run_lp_search(LPSearchConfig(save_dir=str(tmp_path / "full"), **base))

    out_half = run_lp_search(
        LPSearchConfig(save_dir=str(tmp_path / "half"), **base), max_steps=2
    )
    ckpt = os.path.join(out_half["run_dir"], "search_state.msgpack")
    out_res = run_lp_search(
        LPSearchConfig(save_dir=str(tmp_path / "res"), checkpoint=ckpt, **base)
    )
    assert out_res["last_loss"] == out_full["last_loss"]
    assert [g.to_reference_str() for g in out_res["genotypes"]] == [
        g.to_reference_str() for g in out_full["genotypes"]
    ]


def test_lp_search_score_fn_searched_and_retrains(tmp_path):
    """--search-score-fn puts the score mixture into the loss; the decoded
    genotype carries a searched (non-None) score_func that retrains."""
    from mr_gnas_tpu.cells import genotypes_to_json
    from mr_gnas_tpu.ops.registry import SF_OPS

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
        epochs=4,
        layers=1,
        search_score_fn=True,
    )
    out = run_lp_search(cfg)
    sf = out["genotypes"][-1].score_func
    assert sf in SF_OPS
    tcfg = LPTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=genotypes_to_json(out["genotypes"]),
    )
    tout = run_lp_train(tcfg)
    assert 0.0 <= tout["test"]["mrr"] <= 1.0


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


def test_lp_train_eval_every(tmp_path):
    # eval_every thins the per-epoch ranking pass; the final epoch always
    # evaluates so out["test"] reflects the trained model.
    cfg = LPTrainConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=4,
        eval_every=3,
        genotype=GENO_LP,
        embed_dim=16,
        num_filt=4,
        ker_sz=3,
        k_w=4,
        k_h=4,
        log_every=1,
    )
    out = run_lp_train(cfg)
    with open(os.path.join(out["run_dir"], "scalars.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    eval_epochs = sorted(r["step"] for r in recs if "val_mrr" in r)
    # epochs 0 and 3 (multiple of 3) evaluate; 3 is also the final epoch
    assert eval_epochs == [0, 3]
    assert 0.0 <= out["test"]["mrr"] <= 1.0


@pytest.mark.smoke
def test_lp_search_steps_per_call_equivalent(tmp_path):
    # the device-side search scan (--steps-per-call) must reproduce the
    # per-epoch loop: same split(fold_in(key(seed), epoch)) keys, same
    # arch-then-weight update order, bit-identical genotype decode
    # sequence (the scan emits every epoch's alpha snapshot). epochs=8 /
    # warm=1 / spc=3 exercises warm per-epoch prologue, two full chunks,
    # and the per-epoch remainder.
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=40,
        graph_batch_size_val=20,
        negative_sample=3,
        warm_epochs=1,
        epochs=8,
        layers=1,
        max_patience=99,
        log_every=1,
    )
    out1 = run_lp_search(LPSearchConfig(save_dir=str(tmp_path / "s1"), **base))
    out3 = run_lp_search(
        LPSearchConfig(save_dir=str(tmp_path / "s3"), steps_per_call=3, **base)
    )
    assert [g.to_reference_str() for g in out3["genotypes"]] == [
        g.to_reference_str() for g in out1["genotypes"]
    ]
    assert out3["last_loss"] == pytest.approx(out1["last_loss"], rel=1e-5)

    def losses(out):
        with open(os.path.join(out["run_dir"], "scalars.jsonl")) as f:
            return [
                (json.loads(l)["train_loss"], json.loads(l)["arch_loss"])
                for l in f if "train_loss" in l
            ]

    np.testing.assert_allclose(
        np.array(losses(out1)), np.array(losses(out3)), rtol=2e-4, atol=1e-6
    )


@pytest.mark.smoke
def test_lp_train_steps_per_call_equivalent(tmp_path):
    # the device-side scan loop (--steps-per-call) must reproduce the
    # per-step loop exactly: same fold_in(epoch_key, step) dropout keys,
    # same optimizer-update order. 150 train triples / batch 32 = 5
    # steps -> spc=2 exercises both full chunks and the remainder path.
    base = dict(
        dataset="synthetic",
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
    out1 = run_lp_train(LPTrainConfig(save_dir=str(tmp_path / "s1"), **base))
    out2 = run_lp_train(
        LPTrainConfig(save_dir=str(tmp_path / "s2"), steps_per_call=2, **base)
    )
    assert out2["test"]["mrr"] == pytest.approx(out1["test"]["mrr"], abs=1e-9)
    assert out2["test"]["mr"] == pytest.approx(out1["test"]["mr"], abs=1e-6)

    def losses(out):
        with open(os.path.join(out["run_dir"], "scalars.jsonl")) as f:
            return [
                json.loads(l)["train_loss"] for l in f
                if "train_loss" in l
            ]

    np.testing.assert_allclose(losses(out1), losses(out2), rtol=1e-5)


def test_lp_train_pallas_agg_matches(tmp_path):
    """--pallas-agg routes the retrain aggregators through the blocked-
    CSR kernels (the round-5 cold-compile mitigation arm); same math as
    the XLA scatter path — MRR must agree to BN-reassociation noise."""
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=GENO_LP,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    out_x = run_lp_train(LPTrainConfig(save_dir=str(tmp_path / "x"), **base))
    out_p = run_lp_train(
        LPTrainConfig(save_dir=str(tmp_path / "p"), pallas_agg=True, **base)
    )
    np.testing.assert_allclose(out_p["test"]["mrr"], out_x["test"]["mrr"], rtol=5e-3)


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


@pytest.mark.smoke
def test_lp_train_resume_exact(tmp_path):
    """Exact resume: 2 epochs straight == 1 epoch + resume, comparing the
    epoch-1 train loss and eval metrics bitwise (opt state + LR schedule
    + per-epoch RNG all continue)."""
    base = dict(
        dataset="synthetic",
        feature_dim=8,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        genotype=GENO_LP,
    )

    def epoch_scalars(run_dir, epoch):
        with open(os.path.join(run_dir, "scalars.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        merged = {}
        for r in recs:
            if r.get("step") == epoch:
                merged.update(r)
        return merged

    out_full = run_lp_train(
        LPTrainConfig(save_dir=str(tmp_path / "full"), epochs=2, **base)
    )
    out_half = run_lp_train(
        LPTrainConfig(save_dir=str(tmp_path / "half"), epochs=2, **base),
        max_epochs=1,
    )
    # resume from the periodic/best checkpoint of epoch 0
    ckpt = os.path.join(out_half["run_dir"], "model_best_mrr.msgpack")
    assert os.path.exists(ckpt)
    out_res = run_lp_train(
        LPTrainConfig(save_dir=str(tmp_path / "res"), epochs=2, checkpoint=ckpt, **base)
    )
    a = epoch_scalars(out_full["run_dir"], 1)
    b = epoch_scalars(out_res["run_dir"], 1)
    for k in ("train_loss", "val_mrr", "test_mrr"):
        assert a[k] == b[k], (k, a[k], b[k])


def test_lp_search_driver_mesh(tmp_path):
    """The flagship driver honors cfg.mesh_shape: 8-way edge-parallel run
    on the virtual device mesh matches the single-device run's loss.

    Dropout is disabled: the manual-SPMD path (dist/spmd.py)
    intentionally de-correlates dropout masks across shards, so exact
    loss equality only holds dropout-free (grad/stat equality is covered
    by tests/test_spmd.py)."""
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=32,
        graph_batch_size_val=16,
        negative_sample=2,
        warm_epochs=1,
        epochs=3,
        layers=1,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    out1 = run_lp_search(LPSearchConfig(save_dir=str(tmp_path / "s1"), **base))
    out8 = run_lp_search(
        LPSearchConfig(save_dir=str(tmp_path / "s8"), mesh_shape=(8,), **base)
    )
    np.testing.assert_allclose(out8["last_loss"], out1["last_loss"], rtol=1e-4)
    out42 = run_lp_search(
        LPSearchConfig(save_dir=str(tmp_path / "s42"), mesh_shape=(4, 2), **base)
    )
    np.testing.assert_allclose(out42["last_loss"], out1["last_loss"], rtol=1e-4)


@pytest.mark.smoke
def test_lp_train_driver_mesh(tmp_path):
    """lp-train with a (4,2) data x model mesh: the manual-SPMD step
    (edge shards + row-sharded (s, r) batches, dist/spmd.py) produces
    the same loss/MRR as single-device. Dropout off: sharded dropout
    masks are intentionally de-correlated across shards."""
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=GENO_LP,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    out1 = run_lp_train(LPTrainConfig(save_dir=str(tmp_path / "t1"), **base))
    out8 = run_lp_train(
        LPTrainConfig(save_dir=str(tmp_path / "t8"), mesh_shape=(4, 2), **base)
    )
    # single-STEP equality is exact (tests/test_spmd.py retrain test);
    # over a full epoch (~32 optimizer steps + BN running stats) fp
    # reassociation of the psum'd statistics compounds to ~0.2% on MRR.
    # The mesh eval path is encode-once (round-5): one shard_map'd
    # full-graph encode per infer pass, then column-sharded
    # gather+score+rank (logits_from_cols) — so this equality also
    # certifies the hoisted sharded eval against the single-device path.
    np.testing.assert_allclose(out8["test"]["mrr"], out1["test"]["mrr"], rtol=5e-3)
    # --steps-per-call composes with the mesh (round-5): the scan body
    # is the shard_map'd step; K=2 must reproduce the mesh K=1 run up
    # to XLA schedule noise
    out8k = run_lp_train(
        LPTrainConfig(
            save_dir=str(tmp_path / "t8k"), mesh_shape=(4, 2),
            steps_per_call=2, **base,
        )
    )
    np.testing.assert_allclose(out8k["test"]["mrr"], out8["test"]["mrr"], rtol=1e-4)


@pytest.mark.smoke
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


def test_nc_train_driver_mesh(tmp_path):
    """nc-train honors cfg.mesh_shape: block edge rows shard over the
    8-way data axis and match the single-device accuracy."""
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=3,
        layers=1,
        genotype=GENO_NC,
        optimizer="adam",
        learning_rate=5e-3,
        log_every=2,
    )
    out1 = run_nc_train(NCTrainConfig(save_dir=str(tmp_path / "n1"), **base))
    out8 = run_nc_train(
        NCTrainConfig(save_dir=str(tmp_path / "n8"), mesh_shape=(8,), **base)
    )
    # step-level equality is covered by tests/test_spmd.py; over 3
    # epochs the cross-device max-tie convention on duplicate edges
    # (dist/spmd.py docstring) plus fp reassociation can flip one of the
    # 24 eval samples — allow exactly that
    assert abs(out8["best"]["test_acc"] - out1["best"]["test_acc"]) <= 1 / 24 + 1e-9
    assert out8["best"]["test_acc"] > 0.25


@pytest.mark.smoke
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


@pytest.mark.smoke
def test_lp_search_driver_chunked_negatives(tmp_path):
    """End-to-end search with chunk-shared negatives (--neg-chunk)."""
    cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=40,
        graph_batch_size_val=20,
        negative_sample=3,
        warm_epochs=1,
        log_every=2,
        epochs=4,
        layers=1,
        neg_chunk=10,
        search_score_fn=True,  # sf mixture also runs the chunked path
    )
    out = run_lp_search(cfg)
    assert np.isfinite(out["last_loss"])
    assert len(out["genotypes"]) == 1


def test_lp_search_driver_mesh_chunked(tmp_path):
    """Chunk-shared negatives compose with the device mesh: the 8-way
    run matches the single-device run's loss exactly. neg_chunk=2 gives
    32/2 = 16 train chunks and 16/2 = 8 val chunks (the chunk count must
    be divisible by the data axis; dropout off for exact equality, see
    test above)."""
    base = dict(
        dataset="synthetic",
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=32,
        graph_batch_size_val=16,
        negative_sample=2,
        warm_epochs=1,
        epochs=3,
        layers=1,
        neg_chunk=2,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    out1 = run_lp_search(LPSearchConfig(save_dir=str(tmp_path / "s1"), **base))
    out8 = run_lp_search(
        LPSearchConfig(save_dir=str(tmp_path / "s8"), mesh_shape=(8,), **base)
    )
    np.testing.assert_allclose(out8["last_loss"], out1["last_loss"], rtol=1e-4)


def test_lp_search_deterministic_across_runs(tmp_path):
    """Two runs with the same seed produce identical losses — jit
    donation + per-epoch derived RNG keep the step bit-reproducible
    (SURVEY §5 race-detection analog; VERDICT r2 item 7)."""
    def run(tag):
        cfg = LPSearchConfig(
            dataset="synthetic",
            save_dir=str(tmp_path / tag),
            feature_dim=8,
            init_fea_dim=8,
            num_base_r=4,
            graph_batch_size=24,
            graph_batch_size_val=12,
            negative_sample=2,
            warm_epochs=1,
            epochs=5,
            layers=1,
            seed=3,
        )
        out = run_lp_search(cfg)
        with open(os.path.join(out["run_dir"], "scalars.jsonl")) as f:
            return [json.loads(l) for l in f], out["last_loss"]

    recs_a, last_a = run("a")
    recs_b, last_b = run("b")
    assert last_a == last_b
    losses_a = [(r["step"], r.get("train_loss")) for r in recs_a if "train_loss" in r]
    losses_b = [(r["step"], r.get("train_loss")) for r in recs_b if "train_loss" in r]
    assert losses_a == losses_b and losses_a


def test_lp_search_nan_guard_aborts(tmp_path, monkeypatch):
    """A diverging loss trips the finite-check: abort checkpoint written,
    NonFiniteLossError raised instead of burning the run."""
    import numpy as np

    from mr_gnas_tpu.train import lp_search as lps
    from mr_gnas_tpu.train.metrics import NonFiniteLossError

    real = lps.lp_search_loss

    def poisoned(*a, **kw):
        return real(*a, **kw) * np.float32(np.nan)

    monkeypatch.setattr(lps, "lp_search_loss", poisoned)
    cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=8,
        init_fea_dim=8,
        num_base_r=4,
        graph_batch_size=24,
        graph_batch_size_val=12,
        negative_sample=2,
        warm_epochs=10,
        epochs=4,
        layers=1,
        finite_check_every=1,
        grouped_negatives=False,
    )
    with pytest.raises(NonFiniteLossError):
        run_lp_search(cfg)
    run_dirs = [d for d in (tmp_path).iterdir() if d.is_dir()]
    assert any((d / "abort_state.msgpack").exists() for d in run_dirs)


def test_nc_search_driver_mesh(tmp_path):
    """nc-search honors cfg.mesh_shape via the manual-SPMD block
    partitioning: supernet + architect + eval run end-to-end on the
    8-way mesh and produce a decodable genotype with finite losses."""
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
        mesh_shape=(8,),
    )
    out = run_nc_search(cfg)
    assert len(out["genotypes"]) == 1


def test_lp_search_driver_mesh_unrolled(tmp_path):
    """The 2nd-order architect composes with the SPMD mesh: the unrolled
    weight step and fd-HVP differentiate THROUGH the shard_map'd loss."""
    cfg = LPSearchConfig(
        dataset="synthetic",
        save_dir=str(tmp_path),
        feature_dim=16,
        init_fea_dim=8,
        num_base_r=6,
        graph_batch_size=32,
        graph_batch_size_val=16,
        negative_sample=2,
        warm_epochs=1,
        epochs=3,
        layers=1,
        mesh_shape=(8,),
        unrolled=True,
        hvp_mode="fd",
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    out = run_lp_search(cfg)
    assert np.isfinite(out["last_loss"])
