"""ctypes bindings for the native host library (csrc/sampler.cc).

The C++ library replaces the host-side hot loops (the parts the
reference delegates to DGL's C++ backend or runs as slow numpy loops):
neighborhood edge sampling, multi-hop frontier expansion, blocked-CSR
construction. All entry points degrade gracefully to the numpy
implementations when the library is unavailable (``lib() is None``).

Build: ``make -C csrc`` (attempted automatically once per process).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "csrc", "build", "libmrgnas.so")
_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO, "csrc")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        l = ctypes.CDLL(_SO)
    except OSError:
        return None
    l.mrg_sample_neighborhood.restype = ctypes.c_int
    l.mrg_sample_neighborhood.argtypes = [
        _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, _i64p,
    ]
    l.mrg_in_edges_frontier.restype = ctypes.c_int
    l.mrg_in_edges_frontier.argtypes = [
        _i64p, _i64p, _i64p, ctypes.c_int64, _i64p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    l.mrg_blocked_csr.restype = ctypes.c_int
    l.mrg_blocked_csr.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = l
    return _lib


def flatten_adj(adj_list) -> tuple[np.ndarray, np.ndarray]:
    """Pack a python adjacency list into (flat [sum, 2], offsets [n+1])."""
    offsets = np.zeros(len(adj_list) + 1, np.int64)
    for i, a in enumerate(adj_list):
        offsets[i + 1] = offsets[i] + len(a)
    flat = (
        np.concatenate([np.asarray(a, np.int64).reshape(-1, 2) for a in adj_list])
        if offsets[-1]
        else np.zeros((0, 2), np.int64)
    )
    return np.ascontiguousarray(flat), offsets


def sample_edge_neighborhood_native(
    adj_flat: np.ndarray,
    adj_off: np.ndarray,
    n_triplets: int,
    sample_size: int,
    seed: int,
) -> np.ndarray | None:
    """Native connected-subgraph growth sampler; None if lib missing.

    Same distribution family as the numpy sampler (not bit-identical:
    different RNG streams)."""
    l = lib()
    if l is None:
        return None
    out = np.zeros(sample_size, np.int64)
    rc = l.mrg_sample_neighborhood(
        np.ascontiguousarray(adj_flat.reshape(-1)),
        np.ascontiguousarray(adj_off),
        ctypes.c_int64(len(adj_off) - 1),
        ctypes.c_int64(n_triplets),
        ctypes.c_int64(sample_size),
        ctypes.c_uint64(seed),
        out,
    )
    if rc != 0:
        return None
    return out


def in_edges_frontier_native(indptr, src, etype, seeds):
    """One-hop in-edge block + next frontier. Returns
    (edge_src, edge_dst_pos, edge_etype, frontier) or None."""
    l = lib()
    if l is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    src = np.ascontiguousarray(src, np.int64)
    etype = np.ascontiguousarray(etype, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n_nodes = len(indptr) - 1
    ne = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = l.mrg_in_edges_frontier(
        indptr, src, etype, ctypes.c_int64(n_nodes), seeds,
        ctypes.c_int64(len(seeds)),
        ctypes.byref(ne), ctypes.byref(nf),
        None, None, None, None,
    )
    if rc != 0:
        return None
    e_src = np.zeros(ne.value, np.int64)
    e_dst_pos = np.zeros(ne.value, np.int64)
    e_et = np.zeros(ne.value, np.int64)
    frontier = np.zeros(nf.value, np.int64)
    rc = l.mrg_in_edges_frontier(
        indptr, src, etype, ctypes.c_int64(n_nodes), seeds,
        ctypes.c_int64(len(seeds)),
        ctypes.byref(ne), ctypes.byref(nf),
        e_src.ctypes.data_as(ctypes.c_void_p),
        e_dst_pos.ctypes.data_as(ctypes.c_void_p),
        e_et.ctypes.data_as(ctypes.c_void_p),
        frontier.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return e_src, e_dst_pos, e_et, frontier


def blocked_csr_native(dst, mask, n_nodes, bn, rb):
    """Native blocked-CSR build. Returns the same tuple fields as
    kernels.pallas_segment.build_blocked_csr, or None."""
    l = lib()
    if l is None:
        return None
    dst = np.ascontiguousarray(dst, np.int32)
    mask_arr = None if mask is None else np.ascontiguousarray(mask, np.float32)
    e_pad = ctypes.c_int64(0)
    n_chunks = ctypes.c_int64(0)
    mp = mask_arr.ctypes.data_as(ctypes.c_void_p) if mask_arr is not None else None
    rc = l.mrg_blocked_csr(
        dst.ctypes.data_as(ctypes.c_void_p), mp,
        ctypes.c_int64(len(dst)), ctypes.c_int64(n_nodes),
        ctypes.c_int64(bn), ctypes.c_int64(rb),
        ctypes.byref(e_pad), ctypes.byref(n_chunks),
        None, None, None, None, None, None,
    )
    if rc != 0:
        return None
    perm = np.zeros(e_pad.value, np.int32)
    seg = np.zeros(e_pad.value, np.int32)
    cb = np.zeros(n_chunks.value, np.int32)
    cr = np.zeros(n_chunks.value, np.int32)
    cf = np.zeros(n_chunks.value, np.int32)
    counts = np.zeros(n_nodes, np.float32)
    rc = l.mrg_blocked_csr(
        dst.ctypes.data_as(ctypes.c_void_p), mp,
        ctypes.c_int64(len(dst)), ctypes.c_int64(n_nodes),
        ctypes.c_int64(bn), ctypes.c_int64(rb),
        ctypes.byref(e_pad), ctypes.byref(n_chunks),
        perm.ctypes.data_as(ctypes.c_void_p),
        seg.ctypes.data_as(ctypes.c_void_p),
        cb.ctypes.data_as(ctypes.c_void_p),
        cr.ctypes.data_as(ctypes.c_void_p),
        cf.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return perm, seg, cb, cr, cf, counts
