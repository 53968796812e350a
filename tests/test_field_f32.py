"""f32-digit field engine vs host bigint oracle (bit-exact)."""

import random

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
    digits_to_ints,
    fq_f32,
    fr_f32,
    ints_to_digits,
)

rng = random.Random(11)


@pytest.mark.parametrize("ops_fn", [fr_f32, fq_f32], ids=["fr", "fq"])
def test_mul_add_sub_neg(ops_fn):
    ops = ops_fn()
    mod = ops.ctx.modulus
    a_int = [0, 1, mod - 1] + [rng.randrange(mod) for _ in range(61)]
    b_int = [mod - 1, 0, 1] + [rng.randrange(mod) for _ in range(61)]
    import jax.numpy as jnp

    a = jnp.asarray(ints_to_digits(ops, a_int))
    b = jnp.asarray(ints_to_digits(ops, b_int))
    got_mul = digits_to_ints(ops, ops.mul(a, b))
    got_add = digits_to_ints(ops, ops.add(a, b))
    got_sub = digits_to_ints(ops, ops.sub(a, b))
    got_neg = digits_to_ints(ops, ops.neg(a))
    for x, y, gm, ga, gs, gn in zip(a_int, b_int, got_mul, got_add, got_sub,
                                    got_neg):
        assert gm == x * y % mod
        assert ga == (x + y) % mod
        assert gs == (x - y) % mod
        assert gn == (-x) % mod


@pytest.mark.parametrize("ops_fn", [fr_f32, fq_f32], ids=["fr", "fq"])
def test_deep_mul_chain(ops_fn):
    """Stress the redundant-band closure: long chains of mixed ops."""
    ops = ops_fn()
    mod = ops.ctx.modulus
    import jax.numpy as jnp

    a_int = [rng.randrange(mod) for _ in range(8)]
    b_int = [rng.randrange(mod) for _ in range(8)]
    a = jnp.asarray(ints_to_digits(ops, a_int))
    b = jnp.asarray(ints_to_digits(ops, b_int))
    ga, gb = list(a_int), list(b_int)
    for i in range(25):
        a, b = ops.mul(a, b), ops.add(ops.sub(a, b), ops.mul(b, b))
        ga, gb = (
            [x * y % mod for x, y in zip(ga, gb)],
            [(x - y + y * y) % mod for x, y in zip(ga, gb)],
        )
    assert digits_to_ints(ops, a) == ga
    assert digits_to_ints(ops, b) == gb


def test_batch_inv_f32():
    ops = fr_f32()
    mod = ops.ctx.modulus
    import jax.numpy as jnp

    vals = [0] + [rng.randrange(1, mod) for _ in range(31)]
    a = jnp.asarray(ints_to_digits(ops, vals))
    got = digits_to_ints(ops, ops.batch_inv(a))
    assert got[0] == 0
    for v, g in zip(vals[1:], got[1:]):
        assert v * g % mod == 1


def test_from_limb16_roundtrip():
    ops = fr_f32()
    mod = ops.ctx.modulus
    import jax.numpy as jnp

    vals = [rng.randrange(mod) for _ in range(10)]
    a = jnp.asarray(ints_to_digits(ops, vals))
    limbs = ops.to_canonical_limbs(a)
    back = ops.from_limb16(limbs)
    assert digits_to_ints(ops, back) == vals
