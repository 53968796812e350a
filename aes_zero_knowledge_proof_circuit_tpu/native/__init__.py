"""ctypes binding for the native host library (zkhost.cpp).

The shared library is built on demand with g++ into the cache directory and
loaded via ctypes (the environment has no pybind11; SURVEY.md §2b maps the
reference's arkworks native tier to this library + the device kernels).

All entry points degrade gracefully: `lib()` returns None when no compiler
or build failure — callers fall back to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "zkhost.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    from pathlib import Path

    from ..utils.config import CONFIG

    d = str(Path(CONFIG.cache_dir) / "native")
    os.makedirs(d, exist_ok=True)
    return d


def lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("ZKAES_NO_NATIVE"):
            return None
        try:
            # -march=native output is host-specific: key the artifact by
            # the CPU's flag set so a different machine rebuilds (~3s)
            # instead of hitting SIGILL on a cached foreign binary.
            import hashlib as _hl
            import platform as _pf

            try:
                with open("/proc/cpuinfo") as f:
                    flags = [ln for ln in f if ln.startswith("flags")][:1]
                fp = _hl.blake2s(
                    (_pf.machine() + "".join(flags)).encode(),
                    digest_size=6,
                ).hexdigest()
            except OSError:
                fp = _pf.machine()
            so = os.path.join(_build_dir(), f"libzkhost_{fp}.so")
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                tmp = so + ".tmp"
                cmd = ["g++", "-O3", "-march=native", "-funroll-loops",
                       "-shared", "-fPIC", "-std=c++17",
                       "-fopenmp", _SRC, "-o", tmp]
                try:
                    subprocess.run(cmd, check=True, capture_output=True,
                                   timeout=120)
                except subprocess.CalledProcessError:
                    cmd.remove("-fopenmp")  # toolchains without libgomp
                    subprocess.run(cmd, check=True, capture_output=True,
                                   timeout=120)
                os.replace(tmp, so)
            cdll = ctypes.CDLL(so)
            cdll.zk_g1_msm.restype = ctypes.c_int
            cdll.zk_g1_scale_base.restype = ctypes.c_int
            cdll.zk_g1_powers_fixed_base.restype = ctypes.c_int
            cdll.zk_g1_batch_normalize.restype = ctypes.c_int
            if cdll.zk_version() != 1:
                raise RuntimeError("zkhost ABI version mismatch")
            _LIB = cdll
        except Exception as e:  # no compiler / build failure -> Python path
            log.warning("native zkhost unavailable (%s); using Python", e)
            _LIB = None
        return _LIB


def available() -> bool:
    return lib() is not None


# -- converters ---------------------------------------------------------------

def _int_to_limbs(v: int, n: int) -> List[int]:
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(n)]


def _limbs_to_int(row: np.ndarray) -> int:
    v = 0
    for x in reversed(row.tolist()):
        v = (v << 64) | int(x)
    return v


def pack_points(points) -> Tuple[np.ndarray, np.ndarray]:
    """Affine points -> (n,12) u64 canonical + (n,) u8 infinity flags."""
    n = len(points)
    arr = np.zeros((n, 12), np.uint64)
    inf = np.zeros(n, np.uint8)
    for i, p in enumerate(points):
        if p.inf:
            inf[i] = 1
            continue
        arr[i, :6] = _int_to_limbs(p.x, 6)
        arr[i, 6:] = _int_to_limbs(p.y, 6)
    return arr, inf


def pack_scalars(scalars: Sequence[int]) -> np.ndarray:
    out = np.zeros((len(scalars), 4), np.uint64)
    for i, s in enumerate(scalars):
        out[i] = _int_to_limbs(int(s), 4)
    return out


def g1_msm(points, scalars: Sequence[int]):
    """Pippenger MSM over affine points; returns AffinePoint or None when
    the native library is unavailable."""
    cdll = lib()
    if cdll is None or not points:
        return None
    from ..ops.curve_host import g1_infinity, g1_point
    from ..ops.field_params import Q_MOD, inv_mod

    pts, inf = pack_points(points)
    sca = pack_scalars(scalars)
    out = np.zeros(18, np.uint64)
    rc = cdll.zk_g1_msm(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        inf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_size_t(len(points)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        return None
    z = _limbs_to_int(out[12:18])
    if z == 0:
        return g1_infinity()
    zinv = inv_mod(z, Q_MOD)
    zinv2 = zinv * zinv % Q_MOD
    x = _limbs_to_int(out[0:6]) * zinv2 % Q_MOD
    y = _limbs_to_int(out[6:12]) * zinv2 * zinv % Q_MOD
    return g1_point(x, y)


def g1_powers_fixed_base_packed(base, scalars: Sequence[int]):
    """[s * base for s in scalars] as a packed (n, 2, 24) uint32 16-bit-limb
    array (the SRS checkpoint layout; infinity rows are all-zero), or None.
    Uses 8-bit window tables + OpenMP — the SRS powers-of-tau generator."""
    cdll = lib()
    if cdll is None:
        return None
    bxy = np.zeros(12, np.uint64)
    bxy[:6] = _int_to_limbs(base.x, 6)
    bxy[6:] = _int_to_limbs(base.y, 6)
    sca = pack_scalars(scalars)
    out = np.zeros((len(scalars), 13), np.uint64)
    rc = cdll.zk_g1_powers_fixed_base(
        bxy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_size_t(len(scalars)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        return None
    # u64 limbs -> 16-bit limbs: view each u64 as 4 uint16s (little-endian)
    xy64 = out[:, :12].copy()  # (n, 12) u64
    inf = out[:, 12] != 0
    u16 = xy64.view(np.uint16).reshape(len(scalars), 2, 24)
    packed = u16.astype(np.uint32)
    packed[inf] = 0
    return packed


def limbs16_to_u64(limbs16: np.ndarray) -> np.ndarray:
    """[N, 16] uint32 16-bit limbs (Fr canonical) -> [N, 4] u64 (vectorized).

    The device boundary layout (F32Ops.to_canonical_limbs) -> the native
    scalar layout, with no per-element Python work."""
    l = limbs16.astype(np.uint64)
    out = np.zeros((l.shape[0], 4), np.uint64)
    for k in range(4):
        out[:, k] = (
            l[:, 4 * k]
            | (l[:, 4 * k + 1] << 16)
            | (l[:, 4 * k + 2] << 32)
            | (l[:, 4 * k + 3] << 48)
        )
    return out


def g1_msm_packed(packed: np.ndarray, scalars_u64: np.ndarray,
                  window_bits: int = 0):
    """Pippenger MSM over [N, 2, 24] u32 16-bit-limb packed affine points
    (the SRS checkpoint layout) with [N, 4] u64 scalars. OpenMP windows.
    Returns AffinePoint or None when the native library is unavailable."""
    cdll = lib()
    if cdll is None or packed.shape[0] == 0:
        return None
    from ..ops.curve_host import g1_infinity, g1_point
    from ..ops.field_params import Q_MOD, inv_mod

    packed = np.ascontiguousarray(packed.astype(np.uint32))
    scalars_u64 = np.ascontiguousarray(scalars_u64.astype(np.uint64))
    out = np.zeros(18, np.uint64)
    rc = cdll.zk_g1_msm_limb16(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        scalars_u64.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_size_t(packed.shape[0]),
        ctypes.c_int(window_bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        return None
    z = _limbs_to_int(out[12:18])
    if z == 0:
        return g1_infinity()
    zinv = inv_mod(z, Q_MOD)
    zinv2 = zinv * zinv % Q_MOD
    x = _limbs_to_int(out[0:6]) * zinv2 % Q_MOD
    y = _limbs_to_int(out[6:12]) * zinv2 * zinv % Q_MOD
    return g1_point(x, y)


def g1_scale_base(base, scalars: Sequence[int]):
    """[s * base for s in scalars] as affine points, or None."""
    cdll = lib()
    if cdll is None:
        return None
    from ..ops.curve_host import g1_infinity, g1_point

    bxy = np.zeros(12, np.uint64)
    bxy[:6] = _int_to_limbs(base.x, 6)
    bxy[6:] = _int_to_limbs(base.y, 6)
    sca = pack_scalars(scalars)
    out = np.zeros((len(scalars), 13), np.uint64)
    rc = cdll.zk_g1_scale_base(
        bxy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_size_t(len(scalars)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        return None
    res = []
    for row in out:
        if int(row[12]):
            res.append(g1_infinity())
        else:
            res.append(g1_point(_limbs_to_int(row[:6]),
                                _limbs_to_int(row[6:12])))
    return res
