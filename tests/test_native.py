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
