"""Native host data plane (C++ via ctypes).

The TPU compute path is JAX/XLA/Pallas; this package is the host-side native
layer replacing the reference's torch DataLoader workers (lib/dataset.py
__getitem__ hot loops).  ``dataplane.cc`` is compiled lazily with g++ into a
cached shared library; every entry point has a numpy fallback so the package
works on machines without a toolchain (set ``SCAN2CAP_NATIVE=0`` to force the
fallbacks).

API (all numpy in/out, f32):
  sample_gather(points, choices)      -> gathered rows
  augment_points(pc, flip_yz, flip_xz, rot, trans) -> pc (xyz cols updated)
  point_votes(xyz, instance_labels, care) -> (votes (M,3), mask (M,))
  available()                         -> bool (library loaded)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataplane.cc")
_LIB_PATH = os.path.join(_DIR, "_dataplane.so")
_THREADS = max(2, (os.cpu_count() or 4) // 2)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # build to a process-unique temp path and rename atomically — concurrent
    # processes (training + pytest) must never dlopen a half-written .so
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SCAN2CAP_NATIVE", "1") == "0":
            return None
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64, i32, f32p, i32p, u8p = (ctypes.c_int64, ctypes.c_int32,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.POINTER(ctypes.c_int32),
                                     ctypes.POINTER(ctypes.c_uint8))
        lib.s2c_sample_gather.argtypes = [f32p, i32p, f32p, i64, i64,
                                          ctypes.c_int]
        lib.s2c_augment_points.argtypes = [f32p, i64, i64, ctypes.c_int,
                                           ctypes.c_int, f32p, f32p,
                                           ctypes.c_int]
        lib.s2c_point_votes.argtypes = [f32p, i64, i32p, u8p, i64, i32,
                                        f32p, f32p]
        lib.s2c_point_votes.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sample_gather(points: np.ndarray, choices: np.ndarray) -> np.ndarray:
    """points (N, C) f32, choices (M,) int -> (M, C) f32."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        return points[choices]
    idx = np.ascontiguousarray(choices, np.int32)
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= len(points)):
        # match the numpy fallback's failure mode: points[choices] raises
        # IndexError where the native memcpy would silently read (or fault
        # on) out-of-bounds heap bytes
        raise IndexError(
            f"sample_gather: choices out of range [0, {len(points)}) "
            f"(min {int(idx.min())}, max {int(idx.max())})")
    out = np.empty((idx.shape[0], points.shape[1]), np.float32)
    lib.s2c_sample_gather(
        _fptr(points), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(out), out.shape[0], out.shape[1], _THREADS)
    return out


def augment_points(pc: np.ndarray, flip_yz: bool, flip_xz: bool,
                   rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Apply flips + rotation (x' = x @ rot.T) + translation to the xyz
    columns of pc (M, C) f32.  Returns pc (modified copy)."""
    pc = np.ascontiguousarray(pc, np.float32).copy()
    lib = _load()
    if lib is None:
        xyz = pc[:, :3]
        if flip_yz:
            xyz[:, 0] = -xyz[:, 0]
        if flip_xz:
            xyz[:, 1] = -xyz[:, 1]
        pc[:, :3] = xyz @ np.asarray(rot, np.float32).T \
            + np.asarray(trans, np.float32)
        return pc
    r = np.ascontiguousarray(rot, np.float32)
    t = np.ascontiguousarray(trans, np.float32)
    lib.s2c_augment_points(_fptr(pc), pc.shape[0], pc.shape[1],
                           int(flip_yz), int(flip_xz), _fptr(r), _fptr(t),
                           _THREADS)
    return pc


def point_votes(xyz: np.ndarray, instance_labels: np.ndarray,
                care: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Votes to instance centers, gated by the instance's FIRST point's care
    flag (lib/dataset.py:427-442 semantics).

    xyz (M, >=3) f32; instance_labels (M,) int; care (M,) bool-like.
    Returns (votes (M, 3) f32, mask (M,) f32)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    inst = np.ascontiguousarray(instance_labels, np.int32)
    care_u8 = np.ascontiguousarray(care, np.uint8)
    lib = _load()
    m = xyz.shape[0]
    if lib is not None:
        id_cap = int(inst.max(initial=0)) + 1 if m else 1
        votes = np.empty((m, 3), np.float32)
        mask = np.empty((m,), np.float32)
        rc = lib.s2c_point_votes(
            _fptr(xyz), xyz.shape[1],
            inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            care_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            m, id_cap, _fptr(votes), _fptr(mask))
        if rc == 0:
            return votes, mask
    # numpy fallback — the reference's O(instances * M) loop
    votes = np.zeros((m, 3), np.float32)
    mask = np.zeros((m,), np.float32)
    for i_instance in np.unique(inst):
        ind = np.where(inst == i_instance)[0]
        if i_instance < 0 or not care_u8[ind[0]]:
            continue
        x = xyz[ind, :3]
        center = 0.5 * (x.min(0) + x.max(0))
        votes[ind] = center - x
        mask[ind] = 1.0
    return votes, mask
