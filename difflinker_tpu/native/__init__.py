"""ctypes binding for the native (C++) evaluation kernels.

Compiled lazily on first import with g++ (cached as libdlnative.so next to the
source); any failure — no compiler, sandboxed FS — degrades silently to the
numpy implementations in chem/bonds.py. Disable explicitly with
DIFFLINKER_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'bondperception.cpp')
_LIB_PATH = os.path.join(_HERE, 'libdlnative.so')

_lib = None


def _build() -> bool:
    try:
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return True
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC,
               '-o', _LIB_PATH]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            print(f'[difflinker_tpu.native] build failed:\n{res.stderr}',
                  file=sys.stderr)
            return False
        return True
    except Exception as e:  # missing g++, read-only fs, ...
        print(f'[difflinker_tpu.native] build unavailable: {e}', file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get('DIFFLINKER_NATIVE', '1') == '0':
        return None
    if not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    f64p = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    i8p = np.ctypeslib.ndpointer(np.int8, flags='C_CONTIGUOUS')

    lib.bond_orders.argtypes = [f64p, i32p, ctypes.c_int, f32p, f32p, f32p,
                                ctypes.c_int, i8p]
    lib.bond_orders.restype = None
    lib.bond_orders_batch.argtypes = [f64p, i32p, i32p, ctypes.c_int,
                                      ctypes.c_int, f32p, f32p, f32p,
                                      ctypes.c_int, i8p]
    lib.bond_orders_batch.restype = None
    lib.connected_components.argtypes = [i8p, ctypes.c_int, i32p]
    lib.connected_components.restype = None
    lib.valence_valid.argtypes = [i8p, i32p, ctypes.c_int, i32p]
    lib.valence_valid.restype = ctypes.c_int32
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def bond_orders(positions: np.ndarray, types: np.ndarray) -> np.ndarray:
    """Native bond_order_matrix; same contract as chem.bonds.bond_order_matrix."""
    from difflinker_tpu import constants
    lib = _load()
    assert lib is not None
    n = len(types)
    pos = np.ascontiguousarray(positions, np.float64)
    t = np.ascontiguousarray(types, np.int32)
    out = np.zeros((n, n), np.int8)
    lib.bond_orders(pos, t, n,
                    np.ascontiguousarray(constants.BOND1_THRESHOLD),
                    np.ascontiguousarray(constants.BOND2_THRESHOLD),
                    np.ascontiguousarray(constants.BOND3_THRESHOLD),
                    constants.BOND1_THRESHOLD.shape[0], out)
    return out


def bond_orders_batch(positions: np.ndarray, types: np.ndarray,
                      n_atoms: np.ndarray) -> np.ndarray:
    """positions (B,N,3), types (B,N), n_atoms (B) → (B,N,N) int8."""
    from difflinker_tpu import constants
    lib = _load()
    assert lib is not None
    b, n_max = types.shape
    out = np.zeros((b, n_max, n_max), np.int8)
    lib.bond_orders_batch(
        np.ascontiguousarray(positions, np.float64),
        np.ascontiguousarray(types, np.int32),
        np.ascontiguousarray(n_atoms, np.int32), b, n_max,
        np.ascontiguousarray(constants.BOND1_THRESHOLD),
        np.ascontiguousarray(constants.BOND2_THRESHOLD),
        np.ascontiguousarray(constants.BOND3_THRESHOLD),
        constants.BOND1_THRESHOLD.shape[0], out)
    return out


def connected_components(adj: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = adj.shape[0]
    labels = np.empty(n, np.int32)
    lib.connected_components(np.ascontiguousarray(adj, np.int8), n, labels)
    return labels


def valence_valid(adj: np.ndarray, types: np.ndarray) -> bool:
    from difflinker_tpu import constants
    lib = _load()
    assert lib is not None
    return bool(lib.valence_valid(
        np.ascontiguousarray(adj, np.int8),
        np.ascontiguousarray(types, np.int32), len(types),
        np.ascontiguousarray(constants.MAX_VALENCE, np.int32)))
