"""JAX curve ops + Pippenger MSM vs host oracle (bit-exact)."""

import random

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import curve_host as ch
from aes_zero_knowledge_proof_circuit_tpu.ops import curve_jax as cj
from aes_zero_knowledge_proof_circuit_tpu.ops import msm_host, msm_jax
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD

rng = random.Random(7)


def _points(n):
    g = ch.g1_generator()
    return [g.mul_scalar(rng.randrange(1, 2**30)) for _ in range(n)]


def test_jac_add_matches_host():
    pts = _points(6)
    dev = cj.affine_to_device(pts)
    a = cj.JacPoint(dev.x[:3], dev.y[:3], dev.z[:3])
    b = cj.JacPoint(dev.x[3:], dev.y[3:], dev.z[3:])
    got = cj.device_to_affine(cj.jac_add(a, b))
    for i in range(3):
        assert got[i] == pts[i].add(pts[3 + i])


def test_jac_add_special_cases():
    pts = _points(2)
    p = cj.affine_to_device([pts[0], pts[0], pts[0], pts[0]])
    q = cj.affine_to_device([pts[0], pts[0].neg(), pts[1], ch.g1_infinity()])
    got = cj.device_to_affine(cj.jac_add(p, q))
    assert got[0] == pts[0].double()        # P + P
    assert got[1].inf                        # P + (-P)
    assert got[2] == pts[0].add(pts[1])      # general
    assert got[3] == pts[0]                  # P + O
    inf = cj.affine_to_device([ch.g1_infinity()])
    r = cj.device_to_affine(cj.jac_add(inf, cj.affine_to_device([pts[1]])))
    assert r[0] == pts[1]


def test_jac_double_matches_host():
    pts = _points(4) + [ch.g1_infinity()]
    dev = cj.affine_to_device(pts)
    got = cj.device_to_affine(cj.jac_double(dev))
    for p, g in zip(pts, got):
        assert g == (p.double() if not p.inf else p)


@pytest.mark.parametrize("n", [1, 5, 16])
def test_msm_matches_host(n):
    pts = _points(n)
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    want = msm_host.msm(pts, scalars)
    got = msm_jax.msm(pts, scalars)
    assert got == want


def test_msm_duplicate_digits_and_zeros():
    """Stress the segmented scan: repeated points, zero scalars, shared
    digits."""
    g = ch.g1_generator()
    pts = [g] * 7 + _points(3)
    scalars = [5, 5, 0, 1, 1, 1, 2, 0, R_MOD - 1, 7]
    want = msm_host.msm(pts, scalars)
    got = msm_jax.msm(pts, scalars)
    assert got == want
