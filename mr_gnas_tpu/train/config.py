"""Typed configuration for the four drivers.

One dataclass hierarchy replaces the reference's four divergent argparse
blocks (search/mr_lp_search.py:282-343, search/mr_nc_search.py:228-260,
train/mr_lp_train.py:362-401, train/mr_nc_train.py:213-245). Defaults
mirror the reference's FB15k-237 / AIFB defaults; genotypes are JSON (the
reference's Python-literal strings are also accepted — parsed safely, no
``eval()``).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class BaseConfig:
    dataset: str = "synthetic"
    data_root: str = "data"
    seed: int = 0
    epochs: int = 100
    save_dir: str = "EXP"
    log_every: int = 10
    feature_dim: int = 128
    init_fea_dim: int = 128
    num_base_r: int = 23
    learning_rate: float = 1e-3
    learning_rate_min: float = 1e-5
    weight_decay: float = 0.0
    momentum: float = 0.9
    grad_norm: float = 5.0
    checkpoint: str = ""
    save_model_freq: int = 300
    profile_steps: int = 0  # >0: record a jax.profiler trace of this many
    # early steps into <run_dir>/profile (utils/profiling.trace)
    finite_check_every: int = 50  # every N epochs, assert the loss is
    # finite; on NaN/inf the driver saves an abort checkpoint and raises
    # instead of burning the rest of the run (SURVEY §5 sanitizers row —
    # the reference has nothing here). 0 disables.
    # distribution: e.g. (8,) = 8-way edge/data parallel, (4, 2) =
    # 4-way data x 2-way model (entity-table) parallel
    mesh_shape: tuple[int, ...] | None = None
    mesh_axes: tuple[str, ...] = ("data", "model")  # trimmed to len(shape)
    # multi-host: initialize the JAX process cluster before any backend
    # use (dist/multihost.initialize; topology auto-detected on TPU pods
    # or from MRG_COORD/MRG_NPROC/MRG_PID). mesh_shape then spans ALL
    # hosts' devices.
    multihost: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), default=str, indent=2)


@dataclasses.dataclass
class SearchMixin:
    layers: int = 2
    zero_nodes: int = 1
    first_nodes: int = 2
    last_nodes: int = 2
    arch_learning_rate: float = 3e-4
    arch_weight_decay: float = 1e-3
    unrolled: bool = False
    hvp_mode: str = "fd"  # 'fd' (reference) | 'exact'
    warm_epochs: int = 10
    max_patience: int = 500


@dataclasses.dataclass
class LPSearchConfig(BaseConfig, SearchMixin):
    """search/mr_lp_search.py defaults (:284-343)."""

    epochs: int = 8000
    feature_dim: int = 200
    init_fea_dim: int = 100
    num_base_r: int = 475
    arch_weight_decay: float = 1e-5  # mr_lp_search.py:296 (NC uses 1e-3)
    graph_batch_size: int = 300
    graph_batch_size_val: int = 100
    graph_split_size: float = 0.5
    negative_sample: int = 10
    edge_sampler: str = "uniform"
    gamma: float = 40.0
    dropout_cell: float = 0.3
    drop_aggr: float = 0.1
    eval_batch_size: int = 1000
    eval_protocol: str = "filtered"
    n_nodes_pad: int = 0  # 0 -> auto (2 * graph_batch_size, rounded)
    bf16: int = -1  # bfloat16 compute in the fused supernet cells and
    # the triplet score path. -1 = auto: ON for TPU backends, off
    # elsewhere — validated by the 500-step alpha-trajectory study at
    # the 131k headline config (NOTES round-3): identical decoded
    # genotypes, stage-alpha cosine >= 0.9999, equal losses vs f32.
    megakernel: int = -1  # training stages via the Pallas BN-mix
    # mega-kernel (kernels/bn_mix.py): the [p, K, R, D] op/BN slabs never
    # touch HBM. -1 = auto (on for TPU backends — +18% measured at the
    # headline config on top of the fused-agg path, NOTES.md; off
    # elsewhere: CPU runs it in interpret mode, slowly); 0/1 force.
    eval_every: int = 0  # >0: in-search filtered-MRR eval on the full
    # test graph every N epochs (the reference's disabled infer_graph,
    # search/mr_lp_search.py:150-167,258-278)
    search_score_fn: bool = False  # put the score-function mixture into
    # the search loss so alphas['final'] gets a gradient and the decoded
    # genotype carries a searched score_func — exceeds the reference,
    # which allocates Cell_SF but never uses it (model_search_lp.py:160)
    grouped_negatives: bool = True  # grouped negative layout: exactly
    # neg//2 corrupted heads + the rest tails PER positive (instead of
    # the reference's per-row Bernoulli side choice, utils_rgcn.py:198)
    # so each positive's (s*r)/(r*o) row is shared across its group —
    # same BCE objective (tests/test_models.py equivalence), ~16% faster
    # steps on TPU (NOTES.md). False restores the reference layout.
    neg_chunk: int = -1  # chunk-shared negatives — positives are
    # split into chunks of ~this many rows and each chunk shares one
    # negative set (data/sampling.negative_sampling_chunked), turning
    # the [P, n, D] negative score slabs + P*n-row grad scatter into
    # batched MXU matmuls + a G*n-row scatter
    # (models/lp.lp_search_loss_chunked). Requires grouped_negatives.
    # -1 = auto (1024 on TPU — the headline layout, promoted to the
    # TPU default in round 4 after the selection-fidelity studies:
    # identical minikg genotypes (round 2), and at the 131k config the
    # chunked long-horizon search decodes the same genotype the grouped
    # 500-step run does, with the one transient gene flip inside the
    # within-layout seed-variance null — NOTES round-4; 0 off
    # elsewhere). 0 = per-positive grouped negatives (the reference-
    # faithful per-positive draw); >0 forces that chunk size anywhere.
    pallas_agg: int = -1  # edge->node aggregators through the fused
    # Pallas gather+compose+reduce kernel (kernels/fused_agg.py) over a
    # statically-padded blocked CSR (one compilation across sampled
    # graphs, graph/build.attach_csr static_pad). -1 = auto (on for TPU
    # backends, off elsewhere — interpret-mode Pallas on CPU is slow);
    # 0/1 force. +20% measured on v5e at the headline config (NOTES.md).
    steps_per_call: int = -1  # device-side search loop: lax.scan this
    # many search EPOCHS (arch step + weight step each, the reference's
    # one-optimization-step-per-epoch unit, search/mr_lp_search.py:193-
    # 251) per jitted call. The K epochs' sampled graphs + batches stack
    # into one host->device transfer (they are statically padded, so
    # every epoch has identical shapes) and the host pays one dispatch
    # per K epochs. Genotype-patience semantics are EXACT: the scan
    # emits every epoch's alpha snapshot and the host decodes each in
    # order. Same math as the per-epoch loop (same fold_in(seed, epoch)
    # key derivation; equivalence-tested). -1 = auto: 8 on TPU (the
    # remote-tunnel regime the round-5 phase study measured: per-epoch
    # dispatch+fetch round trips dominate), 1 elsewhere. First-order
    # architect, single-device path; forced to 1 under a mesh /
    # --unrolled / non-dividing --eval-every.


@dataclasses.dataclass
class LPTrainConfig(BaseConfig):
    """train/mr_lp_train.py defaults (:362-401)."""

    epochs: int = 120
    batch_size: int = 256
    num_base_r: int = 23
    steps_per_call: int = -1  # device-side training loop: lax.scan this
    # many optimizer steps per jitted call (packed labels for the whole
    # chunk ship in one transfer), hiding per-step host dispatch/transfer
    # latency — the driver-throughput lever for remote TPUs. 1 = the
    # reference's step-per-call loop; -1 = auto (8 on TPU, 1 elsewhere).
    # Same math either way (scan body = train_step's computation, same
    # fold_in dropout keys; losses agree to XLA-schedule float noise —
    # equivalence-tested). Composes with --mesh-shape (round-5): the
    # scan body is the shard_map'd step.
    eval_every: int = 1  # run the filtered-ranking valid+test pass every
    # N epochs (the reference evaluates every epoch,
    # train/mr_lp_train.py:233-240 — the default keeps that cadence; at
    # FB15k-237 scale one full eval costs ~2 training epochs, so long
    # runs can thin it; the FINAL epoch always evaluates)
    # the published FB15k-237 genotype with the ConvE head — the
    # reference's default (train/mr_lp_train.py:379-380)
    genotype: str = (
        "[Genotype(alpha_cell=[('pre_mult', 1, 0), ('f_sparse_comp', 2, 1), "
        "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
        "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
        "concat_node=[4, 5, 6, 7], score_func='sf_ConvE')]"
    )
    optimizer: str = "adam"
    lbl_smooth: float = 0.1
    dropout_cell: float = 0.3
    # (--drop_op deliberately absent: it is a no-op in the reference,
    # model_lp.py:34 discards the dropout result)
    drop_aggr: float = 0.1
    gamma: float = 40.0
    pallas_agg: bool = False  # route the edge->node aggregators through
    # the Pallas blocked-CSR segment kernels (graph/build.attach_csr)
    # ConvE head (train/mr_lp_train.py:383-390)
    conve_hid_drop: float = 0.3
    feat_drop: float = 0.3
    k_w: int = 8
    k_h: int = 16
    num_filt: int = 128
    ker_sz: int = 8
    embed_dim: int = 128
    conve_out_bias: bool = False  # the ORIGINAL ConvE's per-entity
    # output bias (the reference's variant drops it); opt-in escape
    # hatch for the dying-relu zero-logit basin on small graphs
    # (NOTES round-3 ConvE analysis)

    def score_args(self) -> dict[str, Any]:
        return {
            "gamma": self.gamma,
            "embed_dim": self.embed_dim,
            "conve_hid_drop": self.conve_hid_drop,
            "feat_drop": self.feat_drop,
            "num_filt": self.num_filt,
            "ker_sz": self.ker_sz,
            "k_w": self.k_w,
            "k_h": self.k_h,
            "conve_out_bias": self.conve_out_bias,
        }


@dataclasses.dataclass
class NCSearchConfig(BaseConfig, SearchMixin):
    """search/mr_nc_search.py defaults (:228-260)."""

    epochs: int = 200
    batch_size: int = 64
    feature_dim: int = 64
    init_fea_dim: int = 16
    num_base_r: int = 50
    first_nodes: int = 3  # --nodes (both first and last stages)
    last_nodes: int = 3
    learning_rate: float = 5e-3
    learning_rate_min: float = 1e-3
    warm_epochs: int = 20
    max_patience: int = 20
    dropout: float = 0.0


@dataclasses.dataclass
class NCTrainConfig(BaseConfig):
    """train/mr_nc_train.py defaults (:213-245)."""

    epochs: int = 600
    batch_size: int = 64
    layers: int = 2
    feature_dim: int = 64
    init_fea_dim: int = 16
    num_base_r: int = 50
    learning_rate: float = 5e-4
    learning_rate_min: float = 1e-5
    optimizer: str = "sgd"
    genotype: str = ""
    op_norm: bool = False  # --op_norm default False (mr_nc_train.py:229)
    dropout: float = 0.0
