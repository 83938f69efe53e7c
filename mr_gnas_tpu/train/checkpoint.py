"""Checkpoint / resume.

Upgrades the reference's ``torch.save({'state_dict', 'epoch'})``
(train/mr_lp_train.py:198-201,262-263) to a full training-state artifact:
params + batch_stats + optimizer state + alphas + genotype JSON + config,
serialized with flax msgpack. Search runs checkpoint alphas too — the
reference only recovered the genotype string from logs (SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
from typing import Any

import flax.serialization
import jax


def save_checkpoint(path: str, state: dict[str, Any], meta: dict[str, Any] | None = None):
    """Serialize a pytree ``state`` plus JSON-able ``meta`` sidecar."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict converts optimizer NamedTuples/tuples to plain dicts
    # (msgpack can only carry dict/array pytrees)
    state = flax.serialization.to_state_dict(jax.device_get(state))
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, like: dict[str, Any] | None = None):
    """Load a checkpoint; if ``like`` is given, restore into its pytree
    structure (dtype/shape validated) per top-level key. Top-level keys of
    ``like`` absent from the file keep the value from ``like`` (so old
    checkpoints without e.g. ``opt_state`` still resume, losing only that
    part). Returns (state, meta)."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if like is not None:
        out = {}
        for k, template in like.items():
            if k in raw:
                out[k] = flax.serialization.from_state_dict(template, raw[k])
            else:
                out[k] = template
        raw = out
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return raw, meta
