"""JAX NTT engine (f32 digits) vs host Domain oracle (bit-exact)."""

import random

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import poly_host
from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
    digits_to_ints,
    fr_f32,
    ints_to_digits,
)
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD
from aes_zero_knowledge_proof_circuit_tpu.ops.ntt_jax import ntt_engine

rng = random.Random(99)


@pytest.mark.parametrize("log_n", [1, 4, 8])
def test_ntt_matches_host(log_n):
    import jax.numpy as jnp

    eng = ntt_engine(log_n)
    ops = fr_f32()
    d = poly_host.domain(log_n)
    coeffs = [rng.randrange(R_MOD) for _ in range(d.n)]
    dev = jnp.asarray(ints_to_digits(ops, coeffs))
    got = digits_to_ints(ops, eng.ntt(dev))
    assert got == d.ntt(coeffs)
    back = digits_to_ints(ops, eng.intt(eng.ntt(dev)))
    assert back == coeffs


def test_batch_inv_f32_engine():
    """Batched inversion on the f32-digit engine (0 maps to 0)."""
    import jax.numpy as jnp

    ops = fr_f32()
    vals = [0] + [rng.randrange(1, R_MOD) for _ in range(31)]
    a = jnp.asarray(ints_to_digits(ops, vals))
    got = digits_to_ints(ops, ops.batch_inv(a))
    assert got[0] == 0
    for v, g in zip(vals[1:], got[1:]):
        assert v * g % R_MOD == 1
