"""Host curve + pairing tests: group laws, subgroup orders, bilinearity.

These validate the entire algebra stack the verifier depends on
(SURVEY.md §2b ark-ec / ark-bls12-377 equivalents).
"""

import random

import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import curve_host as ch
from aes_zero_knowledge_proof_circuit_tpu.ops import field_params as fp
from aes_zero_knowledge_proof_circuit_tpu.ops import pairing_host as ph

rng = random.Random(1)


def test_g1_generator_on_curve_and_order():
    g = ch.g1_generator()
    assert g.is_on_curve()
    assert not g.inf
    assert g.mul_scalar(fp.R_MOD).inf


def test_g1_group_law():
    g = ch.g1_generator()
    a, b = rng.randrange(1, 1000), rng.randrange(1, 1000)
    assert g.mul_scalar(a).add(g.mul_scalar(b)) == g.mul_scalar(a + b)
    assert g.add(g.neg()).inf
    assert g.double() == g.add(g)


def test_g2_generator_on_curve_and_order():
    g = ch.g2_generator()
    assert g.is_on_curve()
    assert not g.inf
    assert g.mul_scalar(fp.R_MOD).inf


def test_g2_group_law():
    g = ch.g2_generator()
    a, b = 7, 13
    assert g.mul_scalar(a).add(g.mul_scalar(b)) == g.mul_scalar(a + b)


def test_untwist_lands_on_curve():
    g = ch.g2_generator()
    p = ch.untwist(g)
    assert p.is_on_curve()
    # untwist is a homomorphism on a sample
    assert ch.untwist(g.double()) == p.double()


@pytest.mark.slow
def test_pairing_bilinearity():
    g1 = ch.g1_generator()
    g2 = ch.g2_generator()
    e = ph.pairing(g1, g2)
    # non-degenerate
    import aes_zero_knowledge_proof_circuit_tpu.ops.field_host as fh

    assert e != fh.Fq12.one()
    # e(g1,g2)^r == 1 (target group order r)
    assert e.pow(fp.R_MOD) == fh.Fq12.one()
    a, b = 5, 11
    lhs = ph.pairing(g1.mul_scalar(a), g2.mul_scalar(b))
    rhs = e.pow(a * b)
    assert lhs == rhs
    # linearity in first arg
    assert ph.pairing(g1.mul_scalar(a + b), g2) == ph.pairing(
        g1.mul_scalar(a), g2
    ) * ph.pairing(g1.mul_scalar(b), g2)


@pytest.mark.slow
def test_multi_pairing_matches_product():
    g1 = ch.g1_generator()
    g2 = ch.g2_generator()
    pairs = [(g1.mul_scalar(2), g2.mul_scalar(3)), (g1.mul_scalar(5), g2)]
    prod = ph.pairing(*pairs[0]) * ph.pairing(*pairs[1])
    assert ph.multi_pairing(pairs) == prod
