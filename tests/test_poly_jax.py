"""Device polynomial toolbox (f32 digits) vs host oracle."""

import random

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import poly_host, poly_jax
from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import digits_to_ints
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD

rng = random.Random(5)
F = poly_jax.F


def _from(p):
    return digits_to_ints(F, p)


def test_mul_polys():
    a = poly_host.poly_random(9, rng)
    b = poly_host.poly_random(6, rng)
    got = _from(poly_jax.mul_polys(poly_jax.dpoly(a), poly_jax.dpoly(b)))
    want = poly_host.poly_mul(a, b)
    assert got[: len(want)] == want
    assert all(v == 0 for v in got[len(want):])


def test_eval_and_powers():
    p = poly_host.poly_random(20, rng)
    z = rng.randrange(R_MOD)
    got = _from(poly_jax.eval_at(poly_jax.dpoly(p), poly_jax.scalar(z))[None, :])
    assert got[0] == poly_host.poly_eval(p, z)


def test_tree_sum():
    vals = [rng.randrange(R_MOD) for _ in range(13)]
    got = _from(poly_jax.tree_sum(poly_jax.dpoly(vals))[None, :])
    assert got[0] == sum(vals) % R_MOD


def test_div_vanishing():
    m = 8
    p = poly_host.poly_random(29, rng)
    q, rem = poly_jax.div_vanishing(poly_jax.dpoly(p), m)
    want_q, want_r = poly_host.poly_div_vanishing(p, m)
    gq = _from(q)
    gr = _from(rem)
    assert gq[: len(want_q)] == want_q and all(v == 0 for v in gq[len(want_q):])
    assert gr[: len(want_r)] == want_r and all(v == 0 for v in gr[len(want_r):])


def test_segment_sum_mod():
    n, s = 50, 7
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    ids = [rng.randrange(s) for _ in range(n)]
    got = _from(
        poly_jax.segment_sum_mod(
            poly_jax.dpoly(vals), np.asarray(ids, np.int32), s
        )
    )
    want = [0] * s
    for v, i in zip(vals, ids):
        want[i] = (want[i] + v) % R_MOD
    assert got == want
