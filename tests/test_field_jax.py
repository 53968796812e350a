"""Bit-exact tests: JAX limb field kernels vs the host bigint oracle."""

import random

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import limbs
from aes_zero_knowledge_proof_circuit_tpu.ops.field_jax import fq_ops, fr_ops

rng = random.Random(123)


def _rand_ints(ctx, n):
    vals = [rng.randrange(ctx.modulus) for _ in range(n - 2)]
    return [0, ctx.modulus - 1] + vals  # always include edge cases


@pytest.mark.parametrize("ops_fn", [fr_ops, fq_ops], ids=["fr", "fq"])
def test_add_sub_neg(ops_fn):
    ops = ops_fn()
    ctx = ops.ctx
    a_int = _rand_ints(ctx, 64)
    b_int = _rand_ints(ctx, 64)
    a = limbs.to_mont(ctx, a_int)
    b = limbs.to_mont(ctx, b_int)
    got_add = limbs.from_mont(ctx, np.asarray(ops.add(a, b)))
    got_sub = limbs.from_mont(ctx, np.asarray(ops.sub(a, b)))
    got_neg = limbs.from_mont(ctx, np.asarray(ops.neg(a)))
    for x, y, ga, gs, gn in zip(a_int, b_int, got_add, got_sub, got_neg):
        assert ga == (x + y) % ctx.modulus
        assert gs == (x - y) % ctx.modulus
        assert gn == (-x) % ctx.modulus


@pytest.mark.parametrize("ops_fn", [fr_ops, fq_ops], ids=["fr", "fq"])
def test_mul(ops_fn):
    ops = ops_fn()
    ctx = ops.ctx
    a_int = _rand_ints(ctx, 128)
    b_int = list(reversed(_rand_ints(ctx, 128)))
    a = limbs.to_mont(ctx, a_int)
    b = limbs.to_mont(ctx, b_int)
    got = limbs.from_mont(ctx, np.asarray(ops.mul(a, b)))
    for x, y, g in zip(a_int, b_int, got):
        assert g == x * y % ctx.modulus


def test_mul_broadcast_and_shapes():
    ops = fr_ops()
    ctx = ops.ctx
    a_int = _rand_ints(ctx, 12)
    a = limbs.to_mont(ctx, a_int).reshape(3, 4, ctx.n_limbs)
    s = limbs.to_mont(ctx, [5])[0]
    got = limbs.from_mont(ctx, np.asarray(ops.mul(a, s)))
    for x, g in zip(a_int, got):
        assert g == x * 5 % ctx.modulus


def test_pow_and_inv():
    ops = fr_ops()
    ctx = ops.ctx
    a_int = [rng.randrange(1, ctx.modulus) for _ in range(8)]
    a = limbs.to_mont(ctx, a_int)
    got_pow = limbs.from_mont(ctx, np.asarray(ops.pow_int(a, 1234567)))
    for x, g in zip(a_int, got_pow):
        assert g == pow(x, 1234567, ctx.modulus)


@pytest.mark.slow
def test_fermat_inv():
    ops = fr_ops()
    ctx = ops.ctx
    a_int = [0] + [rng.randrange(1, ctx.modulus) for _ in range(7)]
    a = limbs.to_mont(ctx, a_int)
    got = limbs.from_mont(ctx, np.asarray(ops.inv(a)))
    assert got[0] == 0  # zero maps to zero
    for x, g in zip(a_int[1:], got[1:]):
        assert g * x % ctx.modulus == 1
