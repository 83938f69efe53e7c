"""Operation registry and per-task op-group lists.

One task-parameterized registry replaces the reference's duplicated
``MIXED_OPS`` dicts (models/operations.py:8-29 for NC,
models/operations_lp.py:8-41 for LP). Task differences are expressed as
op-name lists, not duplicated modules (SURVEY.md §7.3).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn

from mr_gnas_tpu.ops import message_ops as M
from mr_gnas_tpu.ops import score_fns as S


class OpArgs(dict):
    """Constructor-time knobs (feature_dim, drop_aggr, gamma, ConvE dims)."""


def _nc_ops(a: OpArgs) -> dict[str, Callable[[], nn.Module]]:
    d = a.get("feature_dim", 100)
    return {
        "pre_mult": lambda: M.PreMult(),
        "pre_sub": lambda: M.PreSub(),
        "pre_add": lambda: M.PreAdd(),
        "pre_corr": lambda: M.PreCorr(),
        "f_zero": lambda: M.FZero(),
        "f_identity": lambda: M.FIdentity(),
        "f_dense": lambda: M.FDense(d),
        "f_sparse": lambda: M.FSparse(d),
        "f_dense_last": lambda: M.FDenseLast(d),
        "f_sparse_last": lambda: M.FSparseLast(d),
        "a_max": lambda: M.AMaxNC(d),
        "a_mean": lambda: M.AMeanNC(d),
        "a_sum": lambda: M.ASumNC(),
        "a_std": lambda: M.AStdNC(),
    }


def _lp_ops(a: OpArgs) -> dict[str, Callable[[], nn.Module]]:
    d = a.get("feature_dim", 100)
    drop_aggr = a.get("drop_aggr", 0.1)
    return {
        "pre_mult": lambda: M.PreMult(),
        "pre_sub": lambda: M.PreSub(),
        "pre_add": lambda: M.PreAdd(),
        "pre_corr": lambda: M.PreCorr(),
        "f_zero": lambda: M.FZero(),
        "f_identity": lambda: M.FIdentity(),
        "f_dense": lambda: M.FDense(d),
        "f_sparse": lambda: M.FSparse(d),
        "f_dense_comp": lambda: M.FDenseComp(d),
        "f_sparse_comp": lambda: M.FSparseComp(d),
        "f_comp": lambda: M.FComp(d),
        "f_dense_last": lambda: M.FDenseLast(d),
        "f_sparse_last": lambda: M.FSparseLast(d),
        "a_max": lambda: M.AMaxLP(d),
        "a_mean": lambda: M.AMeanLP(d),
        "a_sum": lambda: M.ASumLP(drop_aggr),
    }


def make_op(task: str, name: str, args: OpArgs) -> nn.Module:
    """Instantiate op ``name`` for ``task`` ('nc' | 'lp')."""
    table = _nc_ops(args) if task == "nc" else _lp_ops(args)
    if name not in table:
        raise KeyError(f"unknown op {name!r} for task {task!r}")
    return table[name]()


def make_score_fn(name: str, args: OpArgs, with_sigmoid: bool = True) -> nn.Module:
    """Instantiate a score function by name (operations_lp.py:26-30).

    ``with_sigmoid=False`` returns raw logits — the saturation-proof
    BCE-with-logits training path (models/lp.bce_logits_loss); sigmoid
    is monotone, so ranking is unchanged."""
    if name == "sf_TransE":
        return S.SfTransE(gamma=args.get("gamma", 40.0), with_sigmoid=with_sigmoid)
    if name == "sf_DisMult":
        return S.SfDistMult(with_sigmoid=with_sigmoid)
    if name == "sf_ConvE":
        return S.SfConvE(
            embed_dim=args.get("embed_dim", 200),
            num_filt=args.get("num_filt", 200),
            ker_sz=args.get("ker_sz", 7),
            k_w=args.get("k_w", 10),
            k_h=args.get("k_h", 20),
            conve_hid_drop=args.get("conve_hid_drop", 0.3),
            feat_drop=args.get("feat_drop", 0.3),
            with_sigmoid=with_sigmoid,
            out_bias=bool(args.get("conve_out_bias", False)),
        )
    raise KeyError(f"unknown score function {name!r}")


# --- op-group lists (the three-level search space + score functions) -----
# NC (models/operations.py:23-28)
NC_PRE_OPS = ["pre_mult", "pre_sub", "pre_add"]
NC_FIRST_OPS = ["f_zero", "f_identity", "f_dense", "f_sparse"]
NC_MIDDLE_OPS = ["a_max", "a_sum", "a_mean"]
NC_LAST_OPS = ["f_zero", "f_identity", "f_dense_last", "f_sparse_last"]

# LP (models/operations_lp.py:32-37)
LP_PRE_OPS = ["pre_mult", "pre_sub", "pre_add"]
LP_FIRST_OPS = ["f_zero", "f_identity", "f_dense_comp", "f_sparse_comp", "f_comp"]
LP_MIDDLE_OPS = ["a_max", "a_sum", "a_mean"]
LP_LAST_OPS = ["f_zero", "f_identity", "f_dense_last", "f_sparse_last"]
SF_OPS = ["sf_TransE", "sf_DisMult"]


def op_groups(task: str) -> dict[str, list[str]]:
    """The four stage-wise candidate lists for a task."""
    if task == "nc":
        return {
            "zero": NC_PRE_OPS,
            "first": NC_FIRST_OPS,
            "middle": NC_MIDDLE_OPS,
            "last": NC_LAST_OPS,
        }
    return {
        "zero": LP_PRE_OPS,
        "first": LP_FIRST_OPS,
        "middle": LP_MIDDLE_OPS,
        "last": LP_LAST_OPS,
    }
