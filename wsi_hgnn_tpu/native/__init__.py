"""Native host runtime: the C++ graph packer/batcher, bound via ctypes.

Compiled on first use with g++ (cached next to the source); callers fall
back to the NumPy path transparently when no toolchain is available, so the
framework stays importable everywhere.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "wsipack.cpp"
_SO = Path(__file__).parent / "_wsipack.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            # compile to a process-private temp and rename into place:
            # concurrent processes would otherwise race the linker on the
            # shared output path (one can dlopen a half-written file)
            tmp = _SO.with_name(f"_wsipack.{os.getpid()}.tmp.so")
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", str(_SRC), "-o", str(tmp)],
                    check=True, capture_output=True,
                )
                os.replace(tmp, _SO)
            except (OSError, subprocess.CalledProcessError):
                try:
                    tmp.unlink(missing_ok=True)
                except OSError:
                    pass
                # no toolchain (or a failed rebuild): a stale-but-working
                # .so beats losing the native path entirely
                if not _SO.exists():
                    return None
        return ctypes.CDLL(str(_SO))
    except (OSError, subprocess.CalledProcessError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None (NumPy fallback)."""
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
            if _lib is not None:
                _lib.wsipack_batch.restype = ctypes.c_int
                _lib.wsipack_sort_edges.restype = ctypes.c_int
    return _lib


def _pp(arrays: List[np.ndarray], ctype):
    ptr_t = ctypes.POINTER(ctype)
    arr = (ptr_t * len(arrays))()
    for i, a in enumerate(arrays):
        arr[i] = a.ctypes.data_as(ptr_t)
    return arr


def pack_batch_native(
    feats: List[np.ndarray],
    node_types: List[np.ndarray],
    srcs: List[np.ndarray],
    dsts: List[np.ndarray],
    esigns: List[np.ndarray],
    sims: List[np.ndarray],
    cap_nodes: int,
    cap_edges: int,
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Pack per-graph arrays into padded batch buffers via the C++ packer.

    Inputs must be contiguous (feat f32 [n_i, D], node_type/src/dst/esign
    i32, sim f32). Returns (feat, ntype, ngraph, nmask, src, dst, esign,
    sim, emask) or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    b = len(feats)
    d = feats[0].shape[1]
    # validate BEFORE handing raw pointers to C++ — a mixed-dimension
    # cohort would make the memcpy read out of bounds where the NumPy
    # fallback raises cleanly
    for i in range(b):
        if feats[i].ndim != 2 or feats[i].shape[1] != d:
            raise ValueError(
                f"graph {i}: feature dim {feats[i].shape} != [*, {d}] — "
                "all graphs in a batch must share one feature dimension"
            )
        n_i, e_i = feats[i].shape[0], srcs[i].shape[0]
        if (node_types[i].shape[0] != n_i or dsts[i].shape[0] != e_i
                or esigns[i].shape[0] != e_i or sims[i].shape[0] != e_i):
            raise ValueError(f"graph {i}: inconsistent node/edge array lengths")
    feats = [np.ascontiguousarray(f, np.float32) for f in feats]
    node_types = [np.ascontiguousarray(t, np.int32) for t in node_types]
    srcs = [np.ascontiguousarray(s, np.int32) for s in srcs]
    dsts = [np.ascontiguousarray(s, np.int32) for s in dsts]
    esigns = [np.ascontiguousarray(s, np.int32) for s in esigns]
    sims = [np.ascontiguousarray(s, np.float32) for s in sims]

    n_nodes = np.asarray([f.shape[0] for f in feats], np.int64)
    n_edges = np.asarray([s.shape[0] for s in srcs], np.int64)

    out_feat = np.empty((cap_nodes, d), np.float32)
    out_ntype = np.empty(cap_nodes, np.int32)
    out_ngraph = np.empty(cap_nodes, np.int32)
    out_nmask = np.empty(cap_nodes, np.uint8)
    out_src = np.empty(cap_edges, np.int32)
    out_dst = np.empty(cap_edges, np.int32)
    out_esign = np.empty(cap_edges, np.int32)
    out_sim = np.empty(cap_edges, np.float32)
    out_emask = np.empty(cap_edges, np.uint8)

    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, b)

    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.wsipack_batch(
        ctypes.c_int64(b),
        n_nodes.ctypes.data_as(i64p), n_edges.ctypes.data_as(i64p),
        _pp(feats, ctypes.c_float), _pp(node_types, ctypes.c_int32),
        _pp(srcs, ctypes.c_int32), _pp(dsts, ctypes.c_int32),
        _pp(esigns, ctypes.c_int32), _pp(sims, ctypes.c_float),
        ctypes.c_int64(d), ctypes.c_int64(cap_nodes), ctypes.c_int64(cap_edges),
        out_feat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_ntype.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_ngraph.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_nmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_esign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_sim.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_emask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(n_threads),
    )
    if rc != 0:
        raise ValueError("batch exceeds requested capacity")
    return (out_feat, out_ntype, out_ngraph, out_nmask.astype(bool),
            out_src, out_dst, out_esign, out_sim, out_emask.astype(bool))


def sort_edges_native(keys: np.ndarray, n_keys: int) -> Optional[np.ndarray]:
    """Counting-sort permutation of edge keys (preparation for
    sorted-segment kernels); None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, np.int64)
    perm = np.empty(len(keys), np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.wsipack_sort_edges(
        ctypes.c_int64(len(keys)), keys.ctypes.data_as(i64p),
        ctypes.c_int64(n_keys), perm.ctypes.data_as(i64p),
    )
    if rc != 0:
        raise ValueError("edge keys out of range")
    return perm
