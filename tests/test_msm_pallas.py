"""Pallas bucket-scan MSM vs host oracle (interpret mode on CPU).

Edge paths: infinity points, zero scalars, duplicate digits (segment runs),
n not a multiple of the lane count. The incomplete-add contract (no P==+-Q
inside a window scan) holds for distinct random points, mirroring the SRS
deployment (ops/msm_pallas.py module docstring)."""

import random

import jax.numpy as jnp
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import (
    curve_host as ch,
    curve_jax as cj,
    msm_host,
    msm_jax,
)
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD
from aes_zero_knowledge_proof_circuit_tpu.ops.msm_pallas import msm_pallas

rng = random.Random(9)


@pytest.mark.slow
def test_msm_pallas_matches_host():
    g = ch.g1_generator()
    n = 67
    pts = [g.mul_scalar(rng.randrange(1, R_MOD)) for _ in range(n)]
    pts[7] = ch.g1_infinity()
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[11] = 0
    scalars[12] = 0
    # force long equal-digit runs in the low window
    for i in range(20, 30):
        scalars[i] = (scalars[i] & ~0xFF) | 0x5A
    want = msm_host.msm(pts, scalars)
    dev = cj.affine_to_device(pts)
    digits = jnp.asarray(msm_jax.scalars_to_digit_limbs(scalars))
    got = msm_pallas(dev, digits, lanes=8, interpret=True)
    assert got == want


@pytest.mark.slow
def test_msm_pallas_small_and_tiny():
    g = ch.g1_generator()
    for n in (1, 3, 16):
        pts = [g.mul_scalar(rng.randrange(1, R_MOD)) for _ in range(n)]
        scalars = [rng.randrange(R_MOD) for _ in range(n)]
        want = msm_host.msm(pts, scalars)
        dev = cj.affine_to_device(pts)
        digits = jnp.asarray(msm_jax.scalars_to_digit_limbs(scalars))
        got = msm_pallas(dev, digits, lanes=8, interpret=True)
        assert got == want
