"""The edge-list preprocessing path + NC npz round-trip."""
import subprocess
import sys

import numpy as np

from mr_gnas_tpu.data import load_nc_dataset
import pytest


def test_edgelist_preprocess_roundtrip(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "edges.tsv").write_text(
        "a\tr1\tb\nb\tr1\tc\nc\tr2\ta\nd\tr2\tb\na\tr2\tc\n"
    )
    (d / "labels.tsv").write_text("a\tX\nb\tY\nc\tX\n")
    (d / "train.txt").write_text("a\nb\n")
    (d / "test.txt").write_text("c\n")
    out = tmp_path / "ds.npz"
    r = subprocess.run(
        [sys.executable, "scripts/preprocess_rdf.py", "--edgelist", str(d), "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    ds = load_nc_dataset(str(out))
    assert ds.num_nodes == 4  # a b c d
    assert ds.num_rels == 2
    assert ds.num_classes == 2
    assert len(ds.src) == 5
    assert len(ds.target_ids) == 3
    assert len(ds.train_idx) == 2 and len(ds.test_idx) == 1
    # labels consistent: a and c share a class
    la = ds.labels[list(ds.target_ids).index(0)]
    lc = ds.labels[list(ds.target_ids).index(2)]
    assert la == lc


@pytest.mark.slow
def test_parity_trace_dump_compare(tmp_path):
    import json

    GENO = (
        "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
        "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
        "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
        "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
    )
    out = tmp_path / "trace.npz"
    r = subprocess.run(
        [sys.executable, "scripts/parity_trace.py", "dump", "--genotype", GENO,
         "--feature-dim", "16", "--init-fea-dim", "8", "--num-base-r", "4",
         "--cpu", "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r2 = subprocess.run(
        [sys.executable, "scripts/parity_trace.py", "compare", str(out), str(out)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 0
    assert "allclose" in r2.stdout


def test_ntriples_preprocess_end_to_end(tmp_path):
    """DGL-free RDF ingestion: .nt + TSVs -> .npz -> NCDataset -> blocks
    (the real-AIFB path minus only the download)."""
    import subprocess
    import sys

    out = tmp_path / "mini_rdf.npz"
    r = subprocess.run(
        [sys.executable, "scripts/preprocess_rdf.py",
         "--nt", "tests/fixtures/mini_rdf/graph.nt",
         "--train-tsv", "tests/fixtures/mini_rdf/trainingSet.tsv",
         "--test-tsv", "tests/fixtures/mini_rdf/testSet.tsv",
         "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "dropped" in r.stdout  # literal triples excluded

    from mr_gnas_tpu.data import CSRGraph, build_blocks
    from mr_gnas_tpu.data.rdf import load_nc_npz

    ds = load_nc_npz(str(out))
    assert ds.num_classes == 3
    assert ds.num_rels == 3  # affiliation, author, member (name/year are literals)
    assert len(ds.train_idx) == 8 and len(ds.test_idx) == 4
    # all 12 people are targets with labels
    assert len(ds.target_ids) == 12
    # blocks build over the ingested graph
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    blocks, seed_pos = build_blocks(csr, ds.target_ids[ds.train_idx], layers=2)
    assert len(blocks) == 2 and blocks[-1].n_dst >= len(set(ds.train_idx))
