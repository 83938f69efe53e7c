"""CLI layer: flag generation from the typed configs and arg parsing.

The reference exposes four divergent argparse blocks
(/root/reference/search/mr_lp_search.py:282-343 etc.); here every config
field becomes a generated flag on one tool. These tests pin the
generated surface: typed parsing of mesh shapes, booleans, and the
config filtering in main().
"""
from __future__ import annotations

import dataclasses

from mr_gnas_tpu.cli import COMMANDS, build_parser
from mr_gnas_tpu.train import LPSearchConfig


def test_every_config_field_is_a_flag():
    import argparse

    parser = build_parser()
    sub = next(
        a for a in parser._actions if isinstance(a, argparse._SubParsersAction)
    )
    for cmd, (cfg_cls, _) in COMMANDS.items():
        p = sub.choices[cmd]
        flags = {a.dest for a in p._actions}
        for f in dataclasses.fields(cfg_cls):
            assert f.name in flags, f"{cmd}: config field {f.name} has no flag"


def test_lp_search_flag_parsing():
    args = build_parser().parse_args(
        [
            "lp-search",
            "--dataset", "synthetic",
            "--graph-batch-size", "64",
            "--mesh-shape", "4,2",
            "--mesh-axes", "data,model",
            "--grouped-negatives", "false",
            "--unrolled", "true",
        ]
    )
    assert args.command == "lp-search"
    assert args.graph_batch_size == 64
    assert args.mesh_shape == (4, 2)
    assert args.mesh_axes == ("data", "model")
    assert args.grouped_negatives is False
    assert args.unrolled is True
    # round-trips into the typed config
    field_names = {f.name for f in dataclasses.fields(LPSearchConfig)}
    kwargs = {
        k: v for k, v in vars(args).items() if k in field_names and v is not None
    }
    cfg = LPSearchConfig(**kwargs)
    assert cfg.mesh_shape == (4, 2) and cfg.graph_batch_size == 64


def test_compile_cache_flag_default_and_disable():
    p = build_parser()
    on = p.parse_args(["lp-search", "--dataset", "synthetic"])
    assert on.compile_cache  # default: enabled, user cache dir
    off = p.parse_args(
        ["--compile-cache", "", "lp-search", "--dataset", "synthetic"]
    )
    assert off.compile_cache == ""


def test_compile_cache_flag_accepted_after_subcommand():
    """--compile-cache works in either position (ADVICE round 2)."""
    p = build_parser()
    after = p.parse_args(["lp-train", "--dataset", "synthetic", "--compile-cache", "/tmp/x"])
    assert after.compile_cache == "/tmp/x"
    before = p.parse_args(["--compile-cache", "/tmp/y", "lp-train", "--dataset", "synthetic"])
    assert before.compile_cache == "/tmp/y"
    # omitted in both positions -> parent default survives
    neither = p.parse_args(["lp-train", "--dataset", "synthetic"])
    assert neither.compile_cache and "jax-cache" in neither.compile_cache
