"""Work-optimal fused MSM (single-dispatch bucket phase) vs host oracle.

Covers the edge paths: infinity points, zero scalars, n not a multiple of
the lane count, and the mixed-add degenerate branches."""

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
from aes_zero_knowledge_proof_circuit_tpu.ops.msm_fused import (
    fused_window_sums,
    jac_madd,
)

rng = random.Random(5)


@pytest.mark.slow
def test_fused_msm_matches_host():
    g = ch.g1_generator()
    n = 67
    pts = [g.mul_scalar(rng.randrange(1, R_MOD)) for _ in range(n)]
    pts[7] = ch.g1_infinity()
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[11] = 0
    want = msm_host.msm(pts, scalars)
    dev = cj.affine_to_device(pts)
    digits = jnp.asarray(msm_jax.scalars_to_digit_limbs(scalars))
    ws = fused_window_sums(dev, digits, 8, 16)
    got = msm_jax._fold_windows(ws, 8)
    assert got == want


def test_jac_madd_matches_host():
    from aes_zero_knowledge_proof_circuit_tpu.ops.curve_jax import (
        affine_to_device,
        device_to_affine,
    )

    g = ch.g1_generator()
    a = g.mul_scalar(123456789)
    b = g.mul_scalar(987654321)
    p = affine_to_device([a, a, ch.g1_infinity(), a, a])
    # q affine: general add, doubling, p-inf, q-inf, negation
    q = affine_to_device([b, a, b, ch.g1_infinity(), a.neg()])
    q_inf = jnp.asarray([False, False, False, True, False])
    out = jac_madd(p, q.x, q.y, q_inf)
    got = device_to_affine(out)
    assert got[0] == a.add(b)
    assert got[1] == a.double()
    assert got[2] == b
    assert got[3] == a
    assert got[4].inf
