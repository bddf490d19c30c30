"""ctypes bindings for the C++ runtime kernels (pgym_native.cpp).

The shared library builds on first use (g++ -O3 -fopenmp) and caches next
to the source; every entry point has a NumPy fallback so the package works
without a toolchain. See pgym_native.cpp for the kernel contracts and the
reference citations (SURVEY.md §2.3).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "pgym_native.cpp"
_LIB_PATH = Path(__file__).parent / "libpgym_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("native build failed (%s); using NumPy fallbacks", e)
        _build_failed = True
        return None
    return ctypes.CDLL(str(_LIB_PATH))


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
                _lib = ctypes.CDLL(str(_LIB_PATH))
            else:
                _lib = _build()
            if _lib is not None:
                _declare(_lib)
    return _lib


def _declare(lib: ctypes.CDLL) -> None:
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.pgym_cluster_counts.argtypes = [
        i8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, i64p,
    ]
    lib.pgym_cluster_counts.restype = None
    lib.pgym_hhfilter_mask.argtypes = [
        i8p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, u8p,
    ]
    lib.pgym_hhfilter_mask.restype = None
    lib.pgym_affine_align.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p,
    ]
    lib.pgym_affine_align.restype = ctypes.c_int64


# ---------------------------------------------------------------------------
# Public API (native with NumPy fallback)
# ---------------------------------------------------------------------------

def cluster_counts(matrix: np.ndarray, identity_threshold: float) -> np.ndarray:
    """Neighbor counts for EVE cluster weights (ref weights.py:114-161)."""
    matrix = np.ascontiguousarray(matrix, dtype=np.int8)
    n, L = matrix.shape
    lib = get_lib()
    if lib is not None:
        out = np.zeros(n, dtype=np.int64)
        lib.pgym_cluster_counts(matrix, n, L, identity_threshold, out)
        return out
    # fallback: blockwise NumPy
    nongap = (matrix != 0).sum(1).astype(np.float64)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if nongap[i] == 0:
            continue
        m = ((matrix == matrix[i]) & (matrix[i] != 0)).sum(1)
        out[i] = int((m / nongap[i] > identity_threshold).sum())
    return out


def hhfilter_mask(
    matrix: np.ndarray,
    min_coverage: float = 0.75,
    max_identity: float = 0.9,
    min_query_identity: float = 0.0,
) -> np.ndarray:
    """Boolean keep-mask over MSA rows (hhfilter '-cov 75 -id 90' analog,
    ref esm/compute_fitness.py:85-89)."""
    matrix = np.ascontiguousarray(matrix, dtype=np.int8)
    n, L = matrix.shape
    lib = get_lib()
    if lib is not None:
        keep = np.zeros(n, dtype=np.uint8)
        lib.pgym_hhfilter_mask(
            matrix, n, L, min_coverage, max_identity, min_query_identity, keep
        )
        return keep.astype(bool)
    # fallback
    nongap = (matrix != 0).sum(1)
    keep = np.zeros(n, dtype=bool)
    kept = []

    def ident(a, b):
        m = ((matrix[a] == matrix[b]) & (matrix[a] != 0)).sum()
        d = min(nongap[a], nongap[b])
        return m / d if d else 0.0

    for i in range(n):
        if i == 0:
            keep[0] = True
            kept.append(0)
            continue
        if L and nongap[i] / L < min_coverage:
            continue
        if min_query_identity > 0 and ident(i, 0) < min_query_identity:
            continue
        if max_identity < 1.0 and any(ident(i, j) > max_identity for j in kept):
            continue
        keep[i] = True
        kept.append(i)
    return keep


def affine_align(
    a: np.ndarray,
    b: np.ndarray,
    match: int = 200,
    mismatch: int = -100,
    gap_open: int = -1000,
    gap_extend: int = -50,
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Global affine-gap alignment (Gotoh). Returns
    (alignment_length, a_pos->column, b_pos->column)."""
    a = np.ascontiguousarray(a, dtype=np.int8)
    b = np.ascontiguousarray(b, dtype=np.int8)
    lib = get_lib()
    out_a = np.full(len(a), -1, dtype=np.int32)
    out_b = np.full(len(b), -1, dtype=np.int32)
    if lib is not None:
        alen = lib.pgym_affine_align(
            a, len(a), b, len(b), match, mismatch, gap_open, gap_extend,
            out_a, out_b,
        )
        return int(alen), out_a, out_b
    raise RuntimeError(
        "affine_align requires the native library (no NumPy fallback)"
    )


def hmm_forward(
    tokens: np.ndarray,
    log_e_match: np.ndarray,
    log_bg: np.ndarray,
    log_a: dict,
    insert_open: float = 0.01,
    insert_extend: float = 0.4,
) -> Optional[np.ndarray]:
    """Batched profile-HMM forward log-odds on the host (C++/OpenMP),
    mirroring models/hmm.forward_logprob. Returns None when the native
    library is unavailable (callers fall back to the JAX path)."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_hmm_declared"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.pgym_hmm_forward.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64,
            f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double, f64p,
        ]
        lib.pgym_hmm_forward.restype = None
        lib._hmm_declared = True
    tokens = np.ascontiguousarray(tokens, np.int32)
    n, t = tokens.shape
    L = log_e_match.shape[0]
    out = np.zeros(n, np.float64)
    args = [np.ascontiguousarray(log_a[k], np.float64)
            for k in ("MM", "MI", "MD", "IM", "II", "DM", "DD")]
    lib.pgym_hmm_forward(
        tokens, n, t,
        np.ascontiguousarray(log_e_match, np.float64),
        np.ascontiguousarray(log_bg, np.float64),
        *args, L, insert_open, insert_extend, out,
    )
    return out


def nj_tree(
    matrix: np.ndarray,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Neighbor-joining merge tree over MSA rows (C++; FastTree stand-in,
    SURVEY.md §2.3). Returns ``(left, right, left_len, right_len)`` arrays
    of length n-1 — internal node ``n + k`` has children ``left[k]`` /
    ``right[k]`` — or None when the native library is unavailable."""
    matrix = np.ascontiguousarray(matrix, dtype=np.int8)
    n = matrix.shape[0]
    if n < 2:
        return None
    lib = get_lib()
    if lib is None or getattr(lib, "_nj_missing", False):
        return None
    if not hasattr(lib, "_nj_declared"):
        try:  # a cached pre-NJ .so lacks the symbol: fall back, don't crash
            fn = lib.pgym_nj_tree
        except AttributeError:
            lib._nj_missing = True  # warn once, not per call
            log.warning(
                "cached libpgym_native.so predates pgym_nj_tree; delete "
                "%s to rebuild — falling back to greedy cherry pairing",
                _LIB_PATH,
            )
            return None
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        fn.argtypes = [
            i8p, ctypes.c_int64, ctypes.c_int64, i32p, i32p, f64p, f64p,
        ]
        fn.restype = ctypes.c_int64
        lib._nj_declared = True
    left = np.zeros(n - 1, np.int32)
    right = np.zeros(n - 1, np.int32)
    left_len = np.zeros(n - 1, np.float64)
    right_len = np.zeros(n - 1, np.float64)
    k = lib.pgym_nj_tree(
        matrix, n, matrix.shape[1], left, right, left_len, right_len
    )
    if k != n - 1:
        return None
    return left, right, left_len, right_len
