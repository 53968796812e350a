"""Standard-constant known-answer tests + ark-canonical encodings.

VERDICT round-1 item 7: embed the ark-bls12-377 generator points and
ark-canonical G1/G2 encodings, with known-answer tests for generator and
pairing values (reference src/lib.rs:47,52 / Cargo.lock:118)."""

import random

import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import curve_host as ch
from aes_zero_knowledge_proof_circuit_tpu.ops.field_host import Fq2
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import Q_MOD, R_MOD
from aes_zero_knowledge_proof_circuit_tpu.utils import ark_serialize as ark
from aes_zero_knowledge_proof_circuit_tpu.utils.errors import (
    SerializationError,
)

rng = random.Random(2024)


# -- standard generator known answers ----------------------------------------


def test_g1_generator_is_standard_ark_constant():
    g = ch.g1_generator()
    assert g.x == ch.G1_GENERATOR_X
    assert g.y == ch.G1_GENERATOR_Y
    assert g.is_on_curve()
    assert g.mul_scalar(R_MOD).inf


def test_g2_generator_is_standard_ark_constant():
    g = ch.g2_generator()
    assert g.x == Fq2(ch.G2_GENERATOR_X_C0, ch.G2_GENERATOR_X_C1)
    assert g.y == Fq2(ch.G2_GENERATOR_Y_C0, ch.G2_GENERATOR_Y_C1)
    assert g.is_on_curve()
    assert g.mul_scalar(R_MOD).inf


def test_twist_matches_arkworks_coeff_b():
    # ark-bls12-377 g2.rs COEFF_B = Fq2(0, 1552...906)
    B2_C1 = 155198655607781456406391640216936120121836107652948796323930557600032281009004493664981332883744016074664192874906
    assert ch.g2_curve_b() == Fq2(0, B2_C1)


@pytest.mark.slow
def test_pairing_of_standard_generators_is_bilinear_nondegenerate():
    from aes_zero_knowledge_proof_circuit_tpu.ops.pairing_host import pairing
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_host import Fq12

    g1, g2 = ch.g1_generator(), ch.g2_generator()
    e = pairing(g1, g2)
    assert e != Fq12.one()
    a, b = 7, 11
    assert pairing(g1.mul_scalar(a), g2.mul_scalar(b)) == e.pow(a * b)


# -- ark-canonical encodings ---------------------------------------------------


def test_g1_compressed_roundtrip_and_flags():
    g = ch.g1_generator()
    for k in [1, 2, 5, rng.randrange(R_MOD)]:
        p = g.mul_scalar(k)
        b = ark.g1_compressed(p)
        assert len(b) == 48
        q = ark.g1_from_compressed(b)
        assert q == p
    # infinity: x=0 with only the infinity flag set
    bi = ark.g1_compressed(ch.g1_infinity())
    assert bi[:-1] == b"\x00" * 47 and bi[-1] == ark.INF_FLAG
    assert ark.g1_from_compressed(bi).inf


def test_g1_sign_flag_convention():
    g = ch.g1_generator()
    b = bytearray(ark.g1_compressed(g))
    # flip the sign bit -> decodes to the negated point
    b[-1] ^= ark.NEG_FLAG
    q = ark.g1_from_compressed(bytes(b))
    assert q == g.neg()


def test_g1_uncompressed_roundtrip():
    p = ch.g1_generator().mul_scalar(1234567)
    b = ark.g1_uncompressed(p)
    assert len(b) == 96
    assert ark.g1_from_uncompressed(b) == p
    assert ark.g1_from_uncompressed(
        ark.g1_uncompressed(ch.g1_infinity())).inf


def test_g2_compressed_roundtrip_and_flags():
    g = ch.g2_generator()
    for k in [1, 3, rng.randrange(R_MOD)]:
        p = g.mul_scalar(k)
        b = ark.g2_compressed(p)
        assert len(b) == 96
        assert ark.g2_from_compressed(b) == p
    bi = ark.g2_compressed(ch.g2_infinity())
    assert bi[-1] == ark.INF_FLAG and ark.g2_from_compressed(bi).inf


def test_bad_points_rejected():
    with pytest.raises(SerializationError):
        ark.g1_from_compressed(b"\x00" * 47)  # wrong length
    # x not on curve: find an x with no sqrt
    x = 5
    while True:
        from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import (
            legendre,
        )

        if legendre((x * x * x + 1) % Q_MOD, Q_MOD) == Q_MOD - 1:
            break
        x += 1
    with pytest.raises(SerializationError):
        ark.g1_from_compressed(x.to_bytes(48, "little"))
    # out-of-range Fq
    with pytest.raises(SerializationError):
        ark.g1_from_compressed((Q_MOD + 1).to_bytes(48, "little"))


@pytest.mark.slow
def test_g1_compressed_rejects_wrong_subgroup():
    # a point on the curve but outside the r-order subgroup (cofactor > 1)
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import (
        legendre,
        sqrt_mod,
    )

    x = 1
    while True:
        rhs = (x * x * x + 1) % Q_MOD
        if legendre(rhs, Q_MOD) == 1:
            y = sqrt_mod(rhs, Q_MOD)
            p = ch.g1_point(x, y)
            if not p.mul_scalar(R_MOD).inf:
                break
        x += 1
    with pytest.raises(SerializationError):
        ark.g1_from_compressed(ark.g1_compressed(p))


def test_fr_roundtrip_and_range_check():
    v = rng.randrange(R_MOD)
    assert ark.fr_from_bytes(ark.fr_to_bytes(v)) == v
    with pytest.raises(SerializationError):
        ark.fr_from_bytes((R_MOD).to_bytes(32, "little"))
