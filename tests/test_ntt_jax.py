"""JAX NTT engine vs host Domain oracle (bit-exact)."""

import random

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import limbs, poly_host
from aes_zero_knowledge_proof_circuit_tpu.ops.field_jax import fr_ops
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD
from aes_zero_knowledge_proof_circuit_tpu.ops.ntt_jax import ntt_engine

rng = random.Random(99)


@pytest.mark.parametrize("log_n", [1, 4, 8])
def test_ntt_matches_host(log_n):
    eng = ntt_engine(log_n)
    ctx = fr_ops().ctx
    d = poly_host.domain(log_n)
    coeffs = [rng.randrange(R_MOD) for _ in range(d.n)]
    dev = limbs.to_mont(ctx, coeffs)
    got = limbs.from_mont(ctx, np.asarray(eng.ntt(dev)))
    assert got == d.ntt(coeffs)
    back = limbs.from_mont(ctx, np.asarray(eng.intt(np.asarray(eng.ntt(dev)))))
    assert back == coeffs


def test_batch_inv():
    ops = fr_ops()
    ctx = ops.ctx
    vals = [0] + [rng.randrange(1, R_MOD) for _ in range(31)]
    a = limbs.to_mont(ctx, vals)
    got = limbs.from_mont(ctx, np.asarray(ops.batch_inv(a)))
    assert got[0] == 0
    for v, g in zip(vals[1:], got[1:]):
        assert v * g % R_MOD == 1
