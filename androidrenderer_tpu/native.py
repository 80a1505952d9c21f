"""ctypes bindings for the native asset-pipeline library (native/sah_native.cpp).

Falls back to the pure-python implementations (scene/bvh.py,
scene/mesh_storage.py) when the shared library has not been built
(``tools/build_native.sh``). Both backends produce bit-identical array layouts.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).resolve().parent.parent / "build" / "libsah_native.so"
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.sah_build_bvh.restype = ctypes.c_int
    lib.sah_build_bvh.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, u8p,
        f32p, f32p, i32p, i32p, i32p, i32p,
    ]
    lib.sah_sample_surface.restype = ctypes.c_int
    lib.sah_sample_surface.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int32, ctypes.c_uint64, f32p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh_native(positions: np.ndarray, tri_indices: np.ndarray,
                     tri_valid: Optional[np.ndarray] = None):
    """Native BVH build; returns a scene.bvh.BVHArrays or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    from androidrenderer_tpu.scene.bvh import LEAF_SIZE, BVHArrays

    positions = np.ascontiguousarray(positions, np.float32)
    tri_indices = np.ascontiguousarray(tri_indices, np.int32)
    n = tri_indices.shape[0]
    if tri_valid is None:
        tri_valid = np.ones(n, np.uint8)
    else:
        tri_valid = np.ascontiguousarray(tri_valid.astype(np.uint8))
    n_live = int(tri_valid.sum())
    if n_live == 0:
        return None
    num_leaves = max(1, -(-n_live // LEAF_SIZE))
    p = 1
    while p < num_leaves:
        p *= 2
    m = 2 * p - 1
    node_min = np.empty((m, 3), np.float32)
    node_max = np.empty((m, 3), np.float32)
    node_miss = np.empty(m, np.int32)
    node_first = np.empty(m, np.int32)
    node_count = np.empty(m, np.int32)
    tri_order = np.empty(p * LEAF_SIZE, np.int32)
    rc = lib.sah_build_bvh(
        positions, positions.shape[0], tri_indices, n, tri_valid,
        node_min, node_max, node_miss, node_first, node_count, tri_order,
    )
    if rc <= 0:
        return None
    from androidrenderer_tpu.scene.bvh import sanitize_padded_boxes

    fixed = sanitize_padded_boxes(node_min, node_max)
    return BVHArrays(fixed["node_min"], fixed["node_max"], node_miss,
                     node_first, node_count, tri_order)


def sample_surface_native(positions: np.ndarray, tri_indices: np.ndarray,
                          area_per_sample: float, max_points: int,
                          seed: int = 1) -> Optional[np.ndarray]:
    """(k, 6) surface samples [pos, normal], or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    tri_indices = np.ascontiguousarray(tri_indices, np.int32)
    out = np.empty((max_points, 6), np.float32)
    k = lib.sah_sample_surface(
        positions, positions.shape[0], tri_indices, tri_indices.shape[0],
        float(area_per_sample), int(max_points), int(seed), out,
    )
    if k < 0:
        return None
    return out[:k]
