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


def _forge_with_early_u(pk, public_values, rng):
    """Craft the round-5-ordering forgery: assuming the multipoint
    challenge u is derivable BEFORE W_zeta/W_zeta_omega are absorbed
    (the pre-fix transcript), pick garbage wire/z/t commitments and
    fabricated evaluations for a FALSE public input, then solve

        (X - zeta) * W_zeta(X) + u * (X - zeta*omega) * W_zw(X) = P(X)

    for the opening witnesses, where P is the known polynomial under the
    verifier's F - E combination. Under the fixed transcript (u drawn
    after the W commitments) this proof must be rejected."""
    import copy

    from aes_zero_knowledge_proof_circuit_tpu.ops import kzg
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import inv_mod
    from aes_zero_knowledge_proof_circuit_tpu.ops.poly_host import (
        poly_add,
        poly_div_linear,
        poly_eval,
        poly_scale,
        poly_sub,
    )
    from aes_zero_knowledge_proof_circuit_tpu.plonk import backend

    vk, srs = pk.vk, pk.srs
    n, omega = vk.n, vk.omega
    _k1, k2_, k3_ = vk.ks

    def rp(deg):
        return [rng.randrange(R_MOD) for _ in range(deg + 1)]

    a_poly, b_poly, c_poly, z_poly = rp(3), rp(3), rp(3), rp(3)
    t_polys = [rp(3) for _ in range(3)]

    def comm(p):
        return kzg.commit(srs, p)[0]

    comm_a, comm_b, comm_c, comm_z = (
        comm(a_poly), comm(b_poly), comm(c_poly), comm(z_poly))
    comm_t = [comm(p) for p in t_polys]
    ea, eb, ec, es1, es2, ezw = (rng.randrange(R_MOD) for _ in range(6))

    # replay the verifier transcript up to v; u as the OLD scheme drew it
    t = backend._transcript(vk, public_values)
    for lbl, cc in ((b"a", comm_a), (b"b", comm_b), (b"c", comm_c)):
        t.absorb_g1(lbl, cc.point)
    beta = t.challenge_fr(b"beta")
    gamma = t.challenge_fr(b"gamma")
    t.absorb_g1(b"z", comm_z.point)
    alpha = t.challenge_fr(b"alpha")
    for cc in comm_t:
        t.absorb_g1(b"t", cc.point)
    zeta = t.challenge_fr(b"zeta")
    for lbl, e in ((b"a", ea), (b"b", eb), (b"c", ec),
                   (b"s1", es1), (b"s2", es2), (b"zw", ezw)):
        t.absorb_fr(lbl, e)
    v = t.challenge_fr(b"v")
    u = copy.deepcopy(t).challenge_fr(b"u")

    # mirror verify()'s F - E scalar combination over KNOWN polynomials
    zh_zeta = (pow(zeta, n, R_MOD) - 1) % R_MOD
    l1_zeta = (zh_zeta * inv_mod(n * (zeta - 1) % R_MOD, R_MOD)) % R_MOD
    pi_zeta, wj = 0, 1
    for j in range(vk.num_public):
        lj = (zh_zeta * wj % R_MOD
              * inv_mod(n * (zeta - wj) % R_MOD, R_MOD)) % R_MOD
        pi_zeta = (pi_zeta - public_values[j] * lj) % R_MOD
        wj = wj * omega % R_MOD
    r0 = (pi_zeta - l1_zeta * alpha * alpha
          - alpha * ((ea + beta * es1 + gamma) % R_MOD)
          * ((eb + beta * es2 + gamma) % R_MOD)
          * ((ec + gamma) % R_MOD) * ezw) % R_MOD
    z_coeff = (alpha
               * ((ea + beta * zeta + gamma) % R_MOD)
               * ((eb + beta * k2_ * zeta + gamma) % R_MOD)
               * ((ec + beta * k3_ * zeta + gamma) % R_MOD)
               + alpha * alpha % R_MOD * l1_zeta + u) % R_MOD
    s3_coeff = (-(alpha * beta % R_MOD * ezw % R_MOD
                  * ((ea + beta * es1 + gamma) % R_MOD)
                  * ((eb + beta * es2 + gamma) % R_MOD))) % R_MOD
    zn2 = pow(zeta, n, R_MOD)
    ql, qr, qo, qm, qc = pk.selector_polys
    s1p, s2p, s3p = pk.s_sigma_polys
    polys = [qm, ql, qr, qo, qc, z_poly, s3p,
             t_polys[0], t_polys[1], t_polys[2]]
    scalars = [ea * eb % R_MOD, ea, eb, ec, 1, z_coeff, s3_coeff,
               (-zh_zeta) % R_MOD,
               (-zh_zeta) * zn2 % R_MOD,
               (-zh_zeta) * zn2 % R_MOD * zn2 % R_MOD]
    e_scalar = (-r0) % R_MOD
    vp = 1
    for p, ev in ((a_poly, ea), (b_poly, eb), (c_poly, ec),
                  (s1p, es1), (s2p, es2)):
        vp = vp * v % R_MOD
        polys.append(p)
        scalars.append(vp)
        e_scalar = (e_scalar + vp * ev) % R_MOD
    e_scalar = (e_scalar + u * ezw) % R_MOD
    polys.append([1])
    scalars.append((-e_scalar) % R_MOD)
    P = [0]
    for p, s in zip(polys, scalars):
        P = poly_add(P, poly_scale(p, s))

    pz = poly_eval(P, zeta)
    assert pz != 0, "degenerate fabrication; reseed"
    c_const = (pz * inv_mod(u * ((zeta - zeta * omega) % R_MOD) % R_MOD,
                            R_MOD)) % R_MOD
    rest = poly_sub(
        P, poly_scale([(-zeta * omega) % R_MOD, 1], u * c_const % R_MOD))
    wz_poly, rem = poly_div_linear(rest, zeta)
    assert rem == 0
    return backend.PlonkProof(
        comm_a=comm_a, comm_b=comm_b, comm_c=comm_c, comm_z=comm_z,
        comm_t=comm_t, eval_a=ea, eval_b=eb, eval_c=ec,
        eval_s1=es1, eval_s2=es2, eval_zw=ezw,
        w_zeta=comm(wz_poly), w_zeta_omega=comm([c_const]),
    )


def test_plonk_early_u_forgery_rejected(monkeypatch):
    """Regression for the advisor's round-3 soundness finding: with u
    drawn before the opening commitments, an attacker can forge a proof
    of a false public input. The fixed verifier must reject it — and the
    same proof demonstrably PASSES under the broken ordering (sanity
    check that the forgery is the real attack, not a malformed proof)."""
    from aes_zero_knowledge_proof_circuit_tpu.plonk import backend
    from aes_zero_knowledge_proof_circuit_tpu.utils.transcript import (
        Transcript,
    )

    c, _vars = _arith_circuit()
    pk = setup(c, rng=random.Random(1))
    z_false = 424242  # no witness for this statement is ever supplied
    forged = _forge_with_early_u(pk, [z_false], random.Random(99))
    assert not verify(pk.vk, forged, [z_false])

    # sanity: under the pre-fix transcript (W commitments not absorbed
    # before u), the very same proof verifies — the flaw was exploitable.
    orig = Transcript.absorb_g1

    def skip_w(self, label, point):
        if label in (b"wz", b"wzw"):
            return
        orig(self, label, point)

    monkeypatch.setattr(Transcript, "absorb_g1", skip_w)
    assert verify(pk.vk, forged, [z_false])


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


def test_plonk_device_prover_matches_host_and_verifies():
    """The device-path Plonk prover (plonk/backend_jax.py) produces a
    byte-identical proof to the host prover for the same rng seed (same
    blinding draw order, same transcript) and verifies; tampered public
    input still rejected."""
    from aes_zero_knowledge_proof_circuit_tpu.plonk.backend_jax import (
        JaxPlonkProver,
    )

    c, vars_ = _arith_circuit()
    pk = setup(c, rng=random.Random(1))
    xv, yv = 6, 11
    z = (xv * yv + xv + 3) % R_MOD
    assign = _arith_assignment(vars_, xv, yv)
    host_proof = prove(pk, assign, [z], c, rng=random.Random(5))
    jp = JaxPlonkProver(pk)
    dev_proof = jp.prove(assign, [z], c, rng=random.Random(5))
    assert dev_proof.comm_a.point == host_proof.comm_a.point
    assert dev_proof.comm_z.point == host_proof.comm_z.point
    assert [cc.point for cc in dev_proof.comm_t] == [
        cc.point for cc in host_proof.comm_t]
    assert (dev_proof.eval_a, dev_proof.eval_zw) == (
        host_proof.eval_a, host_proof.eval_zw)
    assert dev_proof.w_zeta.point == host_proof.w_zeta.point
    assert dev_proof.w_zeta_omega.point == host_proof.w_zeta_omega.point
    assert verify(pk.vk, dev_proof, [z])
    assert not verify(pk.vk, dev_proof, [(z + 1) % R_MOD])
