"""ctypes bindings for the native mesh-ops library, with numpy fallbacks.

The shared library is built on first use with g++ -O3 (no external build
system needed); if the toolchain is unavailable every function falls back
to an equivalent numpy implementation, so the framework never hard-depends
on the native path."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshops.cpp")
_LIB_PATH = os.path.join(_HERE, "_meshops.so")
_lock = threading.Lock()
_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.unique_edges.restype = ctypes.c_int64
            lib.unique_edges.argtypes = [_i64p, ctypes.c_int64, _i64p, _i64p]
            lib.promote_order2.restype = ctypes.c_int64
            lib.promote_order2.argtypes = [
                _f64p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p, _f64p,
            ]
            lib.connected_components.restype = ctypes.c_int64
            lib.connected_components.argtypes = [
                _i64p, ctypes.c_int64, ctypes.c_int64, _i64p,
            ]
            lib.compact_tets.restype = None
            lib.compact_tets.argtypes = [
                _i32p, _u8p, ctypes.c_int64, _i64p, _i64p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def unique_edges(tets: np.ndarray):
    """(num_tets, 4) -> (unique_edges (E, 2), tet_edge_ids (num_tets, 6))."""
    tets = np.ascontiguousarray(tets, np.int64)
    lib = _load()
    if lib is not None:
        T = len(tets)
        edges = np.empty((6 * T, 2), np.int64)
        ids = np.empty((T, 6), np.int64)
        n = lib.unique_edges(tets, T, edges, ids)
        return edges[:n].copy(), ids
    # numpy fallback (note: ids are first-seen order in native, sorted-order
    # here — both are valid edge labelings)
    pairs = tets[:, [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]]].reshape(-1, 2)
    pairs = np.sort(pairs, axis=1)
    uniq, inverse = np.unique(pairs, axis=0, return_inverse=True)
    return uniq, inverse.reshape(-1, 6)


def promote_order2(verts: np.ndarray, tets: np.ndarray):
    """-> (verts10 (V + E, 3), tets10 (T, 10)) in the interleaved layout."""
    verts = np.ascontiguousarray(verts, np.float64)
    tets = np.ascontiguousarray(tets, np.int64)
    lib = _load()
    if lib is None:
        return None  # caller falls back to the numpy TetMesh path
    T = len(tets)
    tets10 = np.empty((T, 10), np.int64)
    mids = np.empty((6 * T, 3), np.float64)
    n = lib.promote_order2(verts, len(verts), tets, T, tets10, mids)
    return np.concatenate([verts, mids[:n]], axis=0), tets10


def connected_components(tets: np.ndarray, num_verts: int):
    """-> (ncomp, labels (num_verts,)) over tet corner connectivity."""
    tets = np.ascontiguousarray(tets, np.int64)
    lib = _load()
    if lib is not None:
        labels = np.empty(num_verts, np.int64)
        n = lib.connected_components(tets, len(tets), num_verts, labels)
        return int(n), labels
    import scipy.sparse as sp

    rows = np.concatenate([tets[:, i] for i in range(4)])
    cols = np.concatenate([tets[:, (i + 1) % 4] for i in range(4)])
    A = sp.coo_matrix(
        (np.ones_like(rows, np.float32), (rows, cols)),
        shape=(num_verts, num_verts),
    )
    n, labels = sp.csgraph.connected_components(A, directed=False)
    return int(n), labels.astype(np.int64)


def compact_tets(tets: np.ndarray, mask: np.ndarray):
    """Keep masked tets, densely relabel vertices (sorted unique order).
    -> (keep_ids (Vc,), tets_compact (Tc, 4))."""
    tets = np.ascontiguousarray(tets, np.int32)
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    lib = _load()
    if lib is not None:
        T = len(tets)
        keep = np.empty(4 * T, np.int64)
        out = np.empty((T, 4), np.int64)
        nt = ctypes.c_int64()
        nv = ctypes.c_int64()
        lib.compact_tets(tets, mask, T, keep, out, ctypes.byref(nt), ctypes.byref(nv))
        return keep[: nv.value].copy(), out[: nt.value].copy()
    valid = tets[mask.astype(bool)]
    used, inv = np.unique(valid.reshape(-1), return_inverse=True)
    return used.astype(np.int64), inv.reshape(-1, 4).astype(np.int64)


def face_connected_components(tets: np.ndarray):
    """-> (ncomp, tet_labels (T,)) over shared-FACE adjacency.

    Vertex connectivity (connected_components) treats two bodies touching
    at a single vertex or edge as one component, but such joints are
    mechanisms (free relative rotation) that add spurious near-zero
    eigenvalues beyond the 6 rigid modes — observed on the grid-64
    marched turtle (>=10 near-zero modes).  Only a shared triangular
    face transmits stiffness, so the largest FACE-connected component is
    the mechanically meaningful body."""
    import scipy.sparse as sp

    tets = np.ascontiguousarray(tets, np.int64)
    T = len(tets)
    if T == 0:
        return 0, np.zeros(0, np.int64)
    # 4 faces per tet, canonicalized by sorting the 3 vertex ids
    fidx = [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]
    faces = np.concatenate([np.sort(tets[:, f], axis=1) for f in fidx])
    owner = np.tile(np.arange(T), 4)
    order = np.lexsort(faces.T)
    faces, owner = faces[order], owner[order]
    same = np.all(faces[1:] == faces[:-1], axis=1)
    a, b = owner[:-1][same], owner[1:][same]  # face-sharing tet pairs
    A = sp.coo_matrix(
        (np.ones(len(a), np.float32), (a, b)), shape=(T, T)
    )
    n, labels = sp.csgraph.connected_components(A, directed=False)
    return int(n), labels.astype(np.int64)
