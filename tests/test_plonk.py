"""Plonk backend: prove/verify round-trips + negative cases.

Circuits mirror the reference's demo witness ops (src/ops.rs:8-29 xor/add
over u32 bits) at reduced width, plus an arithmetic circuit exercising
mul/add/const gates and copy constraints. Negative tests follow the
reference's tamper pattern (tests/integration_tests.rs:332-336)."""

import random

import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD
from aes_zero_knowledge_proof_circuit_tpu.plonk import (
    PlonkCircuit,
    prove,
    setup,
    verify,
)
from aes_zero_knowledge_proof_circuit_tpu.utils.errors import ZkAesError


def _arith_circuit():
    """public z; private x, y with  x*y + (x + 3) == z."""
    c = PlonkCircuit()
    z_pub = c.public_input()
    x = c.var()
    y = c.var()
    xy = c.mul(x, y)
    x3 = c.add_const(x, 3)
    s = c.add(xy, x3)
    c.assert_equal(s, z_pub)
    return c, (x, y, xy, x3, s)


def _arith_assignment(vars_, xv, yv):
    x, y, xy, x3, s = vars_
    return {
        x: xv,
        y: yv,
        xy: xv * yv % R_MOD,
        x3: (xv + 3) % R_MOD,
        s: (xv * yv + xv + 3) % R_MOD,
    }


def test_plonk_arith_roundtrip():
    c, vars_ = _arith_circuit()
    pk = setup(c, rng=random.Random(1))
    xv, yv = 5, 7
    z = (xv * yv + xv + 3) % R_MOD
    proof = prove(pk, _arith_assignment(vars_, xv, yv), [z], c,
                  rng=random.Random(2))
    assert verify(pk.vk, proof, [z])


def test_plonk_wrong_public_input_rejected():
    c, vars_ = _arith_circuit()
    pk = setup(c, rng=random.Random(1))
    xv, yv = 5, 7
    z = (xv * yv + xv + 3) % R_MOD
    proof = prove(pk, _arith_assignment(vars_, xv, yv), [z], c,
                  rng=random.Random(2))
    assert not verify(pk.vk, proof, [(z + 1) % R_MOD])


def test_plonk_tampered_proof_rejected():
    c, vars_ = _arith_circuit()
    pk = setup(c, rng=random.Random(1))
    xv, yv = 5, 7
    z = (xv * yv + xv + 3) % R_MOD
    proof = prove(pk, _arith_assignment(vars_, xv, yv), [z], c,
                  rng=random.Random(2))
    proof.eval_a = (proof.eval_a + 1) % R_MOD
    assert not verify(pk.vk, proof, [z])


def test_plonk_unsatisfied_witness_raises():
    c, vars_ = _arith_circuit()
    setup(c, rng=random.Random(1))
    bad = _arith_assignment(vars_, 5, 7)
    x = vars_[0]
    bad[x] = 6  # breaks the mul gate
    with pytest.raises(ZkAesError):
        c.wire_columns(bad, [(5 * 7 + 5 + 3) % R_MOD])


def test_plonk_xor_demo():
    """4-bit XOR a la the reference demo circuit (src/ops.rs:8-18)."""
    c = PlonkCircuit()
    pub = [c.public_input() for _ in range(4)]  # expected xor bits
    xs = [c.var() for _ in range(4)]
    ys = [c.var() for _ in range(4)]
    zs = []
    inner = []  # (t=x&y, s=x+y, z) per bit for witness fill
    for xb, yb in zip(xs, ys):
        c.assert_bool(xb)
        c.assert_bool(yb)
        z = c.xor_bits(xb, yb)
        zs.append(z)
        inner.append((z - 2, z - 1, z))  # t, s allocated just before z
    for z, p in zip(zs, pub):
        c.assert_equal(z, p)
    pk = setup(c, rng=random.Random(3))

    xv, yv = 0b1100, 0b1010
    expect = xv ^ yv
    assign = {}
    for i in range(4):
        xb, yb = (xv >> i) & 1, (yv >> i) & 1
        assign[xs[i]] = xb
        assign[ys[i]] = yb
        t, s, z = inner[i]
        assign[t] = xb & yb
        assign[s] = xb + yb
        assign[z] = xb ^ yb
    public = [(expect >> i) & 1 for i in range(4)]
    proof = prove(pk, assign, public, c, rng=random.Random(4))
    assert verify(pk.vk, proof, public)
    bad = list(public)
    bad[0] ^= 1
    assert not verify(pk.vk, proof, bad)


def test_plonk_zk_proofs_differ():
    """Two proofs of the same statement differ (blinding randomness)."""
    c, vars_ = _arith_circuit()
    pk = setup(c, rng=random.Random(1))
    z = (5 * 7 + 5 + 3) % R_MOD
    p1 = prove(pk, _arith_assignment(vars_, 5, 7), [z], c,
               rng=random.Random(10))
    p2 = prove(pk, _arith_assignment(vars_, 5, 7), [z], c,
               rng=random.Random(11))
    assert p1.comm_a.point.x != p2.comm_a.point.x
    assert verify(pk.vk, p1, [z]) and verify(pk.vk, p2, [z])


def test_plonk_reuses_marlin_srs():
    """The Marlin KZG SRS object serves Plonk setup unchanged."""
    from aes_zero_knowledge_proof_circuit_tpu.ops import kzg

    srs = kzg.setup(128, random.Random(5))
    c, vars_ = _arith_circuit()
    pk = setup(c, srs=srs, rng=random.Random(6))
    z = (2 * 9 + 2 + 3) % R_MOD
    proof = prove(pk, _arith_assignment(vars_, 2, 9), [z], c,
                  rng=random.Random(7))
    assert verify(pk.vk, proof, [z])
