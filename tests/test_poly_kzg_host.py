"""Host NTT/poly utilities and KZG commit/open/check tests."""

import random

from aes_zero_knowledge_proof_circuit_tpu.ops import kzg
from aes_zero_knowledge_proof_circuit_tpu.ops import poly_host as ph
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD

rng = random.Random(7)


def test_ntt_roundtrip():
    d = ph.domain(5)
    coeffs = ph.poly_random(d.n - 1, rng)
    evals = d.ntt(coeffs)
    back = d.intt(evals)
    assert back == coeffs
    # pointwise evaluation agreement
    for i in (0, 1, 7):
        assert evals[i] == ph.poly_eval(coeffs, d.elements[i])


def test_poly_mul_matches_schoolbook():
    a = ph.poly_random(6, rng)
    b = ph.poly_random(9, rng)
    prod = ph.poly_mul(a, b)
    # schoolbook
    sb = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            sb[i + j] = (sb[i + j] + x * y) % R_MOD
    assert ph.poly_trim(prod) == ph.poly_trim(sb)


def test_poly_div_vanishing_exact():
    n = 8
    h = ph.poly_random(13, rng)
    # p = h * (X^n - 1) + rem
    rem = ph.poly_random(n - 1, rng)
    vh = [-1 % R_MOD] + [0] * (n - 1) + [1]
    p = ph.poly_add(ph.poly_mul(h, vh), rem)
    q, r = ph.poly_div_vanishing(p, n)
    assert ph.poly_trim(q) == ph.poly_trim(h)
    assert ph.poly_trim(r) == ph.poly_trim(rem)


def test_poly_div_linear():
    p = ph.poly_random(10, rng)
    z = rng.randrange(R_MOD)
    q, v = ph.poly_div_linear(p, z)
    assert v == ph.poly_eval(p, z)
    # p == q*(X-z) + v
    recon = ph.poly_add(ph.poly_mul(q, [(-z) % R_MOD, 1]), [v])
    assert ph.poly_trim(recon) == ph.poly_trim(p)


def test_kzg_commit_open_check():
    srs = kzg.setup(16, rng)
    vk = srs.verifier_part()
    f = ph.poly_random(10, rng)
    g = ph.poly_random(7, rng)
    cf, rf = kzg.commit(srs, f, hiding_bound=1, rng=rng)
    cg, rg = kzg.commit(srs, g)  # non-hiding
    z = rng.randrange(R_MOD)
    xi = rng.randrange(R_MOD)
    proof = kzg.batch_open(srs, [(f, 0, rf), (g, 0, rg)], z, xi)
    vals = [ph.poly_eval(f, z), ph.poly_eval(g, z)]
    assert kzg.batch_check(vk, [cf, cg], z, vals, proof, xi)
    # wrong value must fail
    bad = [vals[0], (vals[1] + 1) % R_MOD]
    assert not kzg.batch_check(vk, [cf, cg], z, bad, proof, xi)


def test_kzg_shifted_commit():
    """Degree-bound enforcement pattern: commit X^(D-d) g, check the shifted
    evaluation relation."""
    srs = kzg.setup(20, rng)
    vk = srs.verifier_part()
    d_bound = 5
    g = ph.poly_random(d_bound, rng)
    shift = srs.max_degree - d_bound
    cg, _ = kzg.commit(srs, g)
    cgs, _ = kzg.commit(srs, g, offset=shift)
    z = rng.randrange(1, R_MOD)
    xi = rng.randrange(R_MOD)
    proof = kzg.batch_open(srs, [(g, 0, None), (g, shift, None)], z, xi)
    v = ph.poly_eval(g, z)
    v_shift = pow(z, shift, R_MOD) * v % R_MOD
    assert kzg.batch_check(vk, [cg, cgs], z, [v, v_shift], proof, xi)
