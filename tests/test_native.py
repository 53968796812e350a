"""Native C++ host library (native/zkhost.cpp) vs the pure-Python oracle.

The native tier replaces arkworks' Rust MSM/field stack on the host side
(SURVEY.md §2b: ark-ec VariableBaseMSM, ark-ff Montgomery arithmetic); these
tests pin it bit-exactly to curve_host/msm_host, the same way the device
kernels are pinned.
"""

import random

import pytest

from aes_zero_knowledge_proof_circuit_tpu import native
from aes_zero_knowledge_proof_circuit_tpu.ops import curve_host as ch
from aes_zero_knowledge_proof_circuit_tpu.ops import msm_host
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native zkhost library not built"
)


def test_native_msm_matches_python_pippenger():
    rng = random.Random(1234)
    g = ch.g1_generator()
    pts = [g.mul_scalar(rng.randrange(1, 2**32)) for _ in range(40)]
    pts[5] = ch.g1_infinity()
    scalars = [rng.randrange(R_MOD) for _ in range(40)]
    scalars[11] = 0
    scalars[12] = 1
    scalars[13] = R_MOD - 1
    got = native.g1_msm(pts, scalars)
    want = msm_host._msm_python(pts, [s % R_MOD for s in scalars])
    assert got == want


def test_native_msm_edge_cases():
    g = ch.g1_generator()
    # single point, scalar one / zero
    assert native.g1_msm([g], [1]) == g
    assert native.g1_msm([g], [0]) == ch.g1_infinity()
    # doubling path inside bucket accumulation (same point twice)
    assert native.g1_msm([g, g], [1, 1]) == g.double()
    # p + (-p)
    assert native.g1_msm([g, g.neg()], [1, 1]) == ch.g1_infinity()


def _pack_points(pts):
    """Affine points -> the [N, 2, 24] u32 16-bit-limb layout
    g1_msm_packed consumes (infinity = all-zero row)."""
    import numpy as np

    packed = np.zeros((len(pts), 2, 24), np.uint32)
    for i, p in enumerate(pts):
        if p.inf:
            continue
        for j in range(24):
            packed[i, 0, j] = (p.x >> (16 * j)) & 0xFFFF
            packed[i, 1, j] = (p.y >> (16 * j)) & 0xFFFF
    return packed


def _scalars_u64(scalars):
    import numpy as np

    out = np.zeros((len(scalars), 4), np.uint64)
    for i, s in enumerate(scalars):
        s %= R_MOD
        for k in range(4):
            out[i, k] = (s >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return out


@pytest.mark.parametrize("c", [0, 4, 6, 9, 13, 16])
def test_native_msm_limb16_differential(c):
    """Pin the signed-digit batch-affine MSM (the prover's main commit
    path, zk_g1_msm_limb16) to the Python oracle across the edge cases
    the collision-deferral/double/cancel sweep must survive: duplicate
    points (forced bucket doubles), negated points (cancellation to
    infinity inside a bucket), infinity rows, equal scalars (forced
    same-bucket collisions), zero / one / r-1 scalars — over a sweep of
    window sizes including the auto choice (c=0)."""
    rng = random.Random(20260821 + c)
    g = ch.g1_generator()
    base = [g.mul_scalar(rng.randrange(1, 2**48)) for _ in range(24)]
    pts = list(base)
    pts += [base[0], base[0]]            # duplicates
    pts += [base[1].neg(), base[1]]      # P and -P
    pts += [ch.g1_infinity(), ch.g1_infinity()]  # infinity rows
    pts += [base[2], base[3], base[4]]   # equal-scalar collision group
    scalars = [rng.randrange(R_MOD) for _ in range(24)]
    scalars += [7, 7]                    # duplicate point, same digit
    s = rng.randrange(R_MOD)
    scalars += [s, s]                    # -P and P with equal scalars
    scalars += [rng.randrange(R_MOD), 0]
    scalars += [123456789] * 3           # forced bucket collisions
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R_MOD - 1
    got = native.g1_msm_packed(_pack_points(pts), _scalars_u64(scalars),
                               window_bits=c)
    assert got is not None
    want = msm_host._msm_python(pts, [x % R_MOD for x in scalars])
    assert got == want


def test_native_msm_limb16_all_cancel():
    """An MSM whose every bucket cancels to infinity returns infinity."""
    g = ch.g1_generator()
    pts = [g, g.neg(), ch.g1_infinity()]
    scalars = [5, 5, 99]
    got = native.g1_msm_packed(_pack_points(pts), _scalars_u64(scalars),
                               window_bits=4)
    assert got is not None
    assert got == ch.g1_infinity()


def test_native_scale_base_matches_mul_scalar():
    rng = random.Random(7)
    g = ch.g1_generator()
    scalars = [0, 1, 2, R_MOD - 1] + [rng.randrange(R_MOD) for _ in range(8)]
    got = native.g1_scale_base(g, scalars)
    want = [g.mul_scalar(s) for s in scalars]
    assert got == want


def test_native_fixed_base_powers_packed():
    from aes_zero_knowledge_proof_circuit_tpu.parallel.srs_gen import (
        PackedPowers,
    )

    rng = random.Random(99)
    g = ch.g1_generator()
    tau = rng.randrange(1, R_MOD)
    n = 33
    scalars = [pow(tau, i, R_MOD) for i in range(n)]
    packed = native.g1_powers_fixed_base_packed(g, scalars)
    pp = PackedPowers(packed)
    assert len(pp) == n
    for i in (0, 1, 2, 17, n - 1):
        assert pp[i] == g.mul_scalar(scalars[i])


def test_msm_host_dispatches_to_native():
    rng = random.Random(5)
    g = ch.g1_generator()
    pts = [g.mul_scalar(rng.randrange(1, 2**20)) for _ in range(16)]
    scalars = [rng.randrange(R_MOD) for _ in range(16)]
    assert msm_host.msm(pts, scalars) == msm_host._msm_python(pts, scalars)
