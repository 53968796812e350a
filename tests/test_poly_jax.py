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


def test_chunked_big_scan_paths_match(monkeypatch):
    """The chunked big-domain paths (powers/tree_sum/batch_inv/
    segment-sum — the 64-byte 2^22 OOM fixes) agree with the fused
    single-program paths when forced at a tiny chunk size."""
    import random

    import jax.numpy as jnp

    from aes_zero_knowledge_proof_circuit_tpu.ops import poly_jax as P
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
        digits_to_ints,
        fr_f32,
        ints_to_digits,
    )
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import (
        R_MOD,
        inv_mod,
    )

    F = fr_f32()
    r = random.Random(17)
    n = 96
    vals = [r.randrange(1, R_MOD) for _ in range(n)]
    x = jnp.asarray(ints_to_digits(F, vals))

    monkeypatch.setattr(P, "BIG_SCAN_N", 32)
    z = r.randrange(R_MOD)
    got = digits_to_ints(F, P.powers(P.scalar(z), n))
    assert got == [pow(z, i, R_MOD) for i in range(n)]

    got = digits_to_ints(F, P.tree_sum(x)[None, :])[0]
    assert got == sum(vals) % R_MOD

    monkeypatch.setattr(F, "_BIG_SCAN_N", 32)
    got = digits_to_ints(F, F.batch_inv(x))
    assert got == [inv_mod(v, R_MOD) for v in vals]


def test_chunked_open_and_eval_match_small_path(monkeypatch):
    """JaxProver's chunked _eval_many/_open_quotient_big agree with the
    fused small paths on the same inputs."""
    import random

    import jax.numpy as jnp

    from aes_zero_knowledge_proof_circuit_tpu.marlin.prover_jax import (
        JaxProver,
    )
    from aes_zero_knowledge_proof_circuit_tpu.ops import poly_jax as P
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
        fr_f32,
        ints_to_digits,
    )
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import (
        R_MOD,
        inv_mod,
    )

    F = fr_f32()
    r = random.Random(23)
    polys = tuple(
        jnp.asarray(ints_to_digits(
            F, [r.randrange(R_MOD) for _ in range(ln)]))
        for ln in (40, 64, 96)
    )
    z = r.randrange(2, R_MOD)
    zd = P.scalar(z)
    small = JaxProver._eval_many_j(polys, zd)
    monkeypatch.setattr(P, "BIG_SCAN_N", 32)
    big = JaxProver._eval_many(polys, zd)
    import numpy as np

    assert np.allclose(np.asarray(F.sub(small, big)).sum(), 0) or (
        [int(v) for v in np.asarray(F.is_zero(F.sub(small, big)))]
        == [1, 1, 1]
    )

    xi_rows = jnp.asarray(ints_to_digits(F, [1, 7, 49]))
    z_pair = (P.scalar(z), P.scalar(inv_mod(z, R_MOD)))
    offsets = (0, 8, 30)
    max_len = max(o + p.shape[0] for o, p in zip(offsets, polys))
    w_small = JaxProver._open_quotient(polys, xi_rows, z_pair, offsets,
                                       max_len)
    self = JaxProver.__new__(JaxProver)  # only _open_quotient_big needed
    w_big = self._open_quotient_big(polys, xi_rows, z_pair, offsets,
                                    max_len)
    zero = F.is_zero(F.sub(w_small, w_big))
    assert bool(np.asarray(zero).all())
