"""Pallas fused Montgomery mul vs the XLA engine (bit-exact).

Runs in interpreter mode on CPU (tests/conftest.py pins the cpu platform);
on-TPU the same kernel compiles to Mosaic."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
    digits_to_ints,
    fq_f32,
    fr_f32,
    ints_to_digits,
)
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import Q_MOD, R_MOD
from aes_zero_knowledge_proof_circuit_tpu.ops.pallas_field import pallas_mul

rng = random.Random(77)

INTERP = jax.default_backend() != "tpu"


@pytest.mark.parametrize("which", ["fr", "fq"])
def test_pallas_mul_matches_engine(which):
    ops = fr_f32() if which == "fr" else fq_f32()
    mod = R_MOD if which == "fr" else Q_MOD
    n = 16
    av = [rng.randrange(mod) for _ in range(n)]
    bv = [rng.randrange(mod) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))
    got = pallas_mul(ops, a, b, interpret=INTERP)
    want_vals = [x * y % mod for x, y in zip(av, bv)]
    assert digits_to_ints(ops, got) == want_vals
    # bit-exact against the engine's own digit output
    ref = ops.mul(a, b)
    assert digits_to_ints(ops, ref) == want_vals


def test_pallas_mul_fold_range_inputs():
    """Engine invariant: inputs may sit anywhere in the fold band [0, 6N)
    with digits in (-2, 260) — e.g. outputs of sub(); products must still
    be exact."""
    ops = fr_f32()
    n = 8
    av = [rng.randrange(R_MOD) for _ in range(n)]
    bv = [rng.randrange(R_MOD) for _ in range(n)]
    cv = [rng.randrange(R_MOD) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))
    c = jnp.asarray(ints_to_digits(ops, cv))
    ab = ops.sub(a, b)          # fold-range, possibly negative digits
    got = pallas_mul(ops, ab, c, interpret=INTERP)
    rinv = pow(1 << (16 * ops.ctx.L), R_MOD - 2, R_MOD)
    want = [
        (x - y) % R_MOD * z % R_MOD for x, y, z in zip(av, bv, cv)
    ]
    del rinv
    assert digits_to_ints(ops, got) == want


def test_pallas_mul_broadcast_scalar():
    ops = fr_f32()
    av = [rng.randrange(R_MOD) for _ in range(8)]
    s = rng.randrange(R_MOD)
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, [s])[0])
    got = pallas_mul(ops, a, b[None, :], interpret=INTERP)
    assert digits_to_ints(ops, got) == [x * s % R_MOD for x in av]


def test_pallas_mul_odd_length_padding():
    ops = fr_f32()
    n = 13  # not a multiple of any tile size
    av = [rng.randrange(R_MOD) for _ in range(n)]
    bv = [rng.randrange(R_MOD) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))
    got = pallas_mul(ops, a, b, interpret=INTERP)
    assert digits_to_ints(ops, got) == [
        x * y % R_MOD for x, y in zip(av, bv)
    ]
