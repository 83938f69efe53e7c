"""Unified CLI: the reference's four scripts as subcommands of one tool.

    python -m mr_gnas_tpu.cli lp-search --dataset FB15k-237 ...
    python -m mr_gnas_tpu.cli lp-train  --genotype '...' ...
    python -m mr_gnas_tpu.cli nc-search --dataset aifb ...
    python -m mr_gnas_tpu.cli nc-train  --genotype '...' ...

Flags are generated from the typed config dataclasses
(:mod:`mr_gnas_tpu.train.config`), so every config field is a flag with
its documented default — replacing the reference's four divergent
argparse blocks and its ``eval()`` genotype parsing.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

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

def run_lp_predict(cfg: LPTrainConfig):
    """Load a retrain checkpoint and rank the test queries (serving
    smoke path); requires --checkpoint and --genotype. With
    --mesh-shape d,m (m > 1) the precomputed entity table serves
    row-sharded over the 'model' axis (serve.Predictor TP analog)."""
    import numpy as np

    from mr_gnas_tpu.data import load_dataset, process
    from mr_gnas_tpu.serve import Predictor

    mesh = None
    if cfg.mesh_shape:
        from mr_gnas_tpu.dist import make_mesh

        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
    pred = Predictor.from_checkpoint(cfg.checkpoint, cfg, mesh=mesh)
    kg = load_dataset(cfg.dataset, cfg.data_root)
    trips = process(
        {"train": kg.train, "valid": kg.valid, "test": kg.test}, kg.num_rels
    )["test_tail"].triples
    vals, idx = pred.topk(trips[:, 0], trips[:, 1], k=10)
    hits = float((idx == trips[:, 2][:, None]).any(axis=1).mean())
    return {"queries": len(trips), "hits@10": hits, "top1_sample": idx[:5, 0].tolist()}


COMMANDS = {
    "lp-search": (LPSearchConfig, run_lp_search),
    "lp-train": (LPTrainConfig, run_lp_train),
    "lp-predict": (LPTrainConfig, run_lp_predict),
    "nc-search": (NCSearchConfig, run_nc_search),
    "nc-train": (NCTrainConfig, run_nc_train),
}


def _add_flags(parser: argparse.ArgumentParser, cfg_cls):
    for f in dataclasses.fields(cfg_cls):
        name = "--" + f.name.replace("_", "-")
        default = f.default
        if isinstance(default, dataclasses._MISSING_TYPE):
            default = None
        if f.name == "mesh_shape":
            parser.add_argument(
                name, default=default, metavar="N[,M...]",
                type=lambda s: tuple(int(x) for x in s.split(",")),
                help="device mesh shape, e.g. 8,1 (data, model axes)",
            )
        elif f.name == "mesh_axes":
            parser.add_argument(
                name, default=default, metavar="AXES",
                type=lambda s: tuple(s.split(",")),
                help="mesh axis names, e.g. data,model",
            )
        elif isinstance(default, bool):
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default, metavar="BOOL",
            )
        elif isinstance(default, (int, float, str)) or default is None:
            parser.add_argument(name, type=type(default) if default is not None else str, default=default)


_CACHE_HELP = (
    "persistent XLA compilation cache directory (TPU driver "
    "programs cold-compile in minutes; the cache makes repeat runs "
    "pay only device time). Pass an empty string to disable."
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("mr-gnas-tpu")
    parser.add_argument(
        "--compile-cache",
        default=os.path.join("~", ".cache", "mr-gnas-tpu", "jax-cache"),
        metavar="DIR",
        help=_CACHE_HELP,
    )
    parser.add_argument(
        "--platform", default=None, metavar="NAME",
        help="force the JAX platform (e.g. cpu, tpu). Defaults to the "
        "JAX_PLATFORMS env var, applied via jax.config so it works even "
        "where a preinstalled TPU plugin ignores the env var.",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for cmd, (cfg_cls, _) in COMMANDS.items():
        p = sub.add_parser(cmd, help=cfg_cls.__doc__)
        # accepted in either position: `--compile-cache D lp-train` and
        # `lp-train --compile-cache D`. SUPPRESS keeps the subcommand
        # occurrence from overwriting the parent default when omitted.
        p.add_argument(
            "--compile-cache", default=argparse.SUPPRESS, metavar="DIR",
            help=_CACHE_HELP,
        )
        _add_flags(p, cfg_cls)
    return parser


def _enable_compile_cache(cache_dir: str) -> None:
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jaxlib without the persistent cache: run cold


def _apply_platform(platform: str | None) -> None:
    """Honor --platform / JAX_PLATFORMS even where a preinstalled TPU
    plugin ignores the env var for standalone scripts (NOTES.md): the
    config update is authoritative where the env is not."""
    platform = platform or os.environ.get("JAX_PLATFORMS") or ""
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _apply_platform(getattr(args, "platform", None))
    if getattr(args, "multihost", False):
        # must run before _enable_compile_cache or any backend touch
        from mr_gnas_tpu.dist.multihost import initialize

        initialize()
    _enable_compile_cache(args.compile_cache)
    cfg_cls, runner = COMMANDS[args.command]
    field_names = {f.name for f in dataclasses.fields(cfg_cls)}
    kwargs = {
        k: v for k, v in vars(args).items() if k in field_names and v is not None
    }
    cfg = cfg_cls(**kwargs)
    result = runner(cfg)
    print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
