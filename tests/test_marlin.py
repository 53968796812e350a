"""End-to-end Marlin SNARK tests on toy R1CS circuits (host scale).

Mirrors the reference's integration posture (SURVEY.md §4): positive
prove/verify plus negative cases (wrong public input, tampered proof).
"""

import random

import pytest

from aes_zero_knowledge_proof_circuit_tpu.marlin import indexer, prover, verifier
from aes_zero_knowledge_proof_circuit_tpu.models.r1cs import R1CS, lc_const
from aes_zero_knowledge_proof_circuit_tpu.ops import kzg
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD

rng = random.Random(42)


def build_toy_circuit():
    """Instance: [1, out1, out2]; witness x, y, z with
    x*y = out1, (x+y)*z = out2, x*x = z  (exercises all matrices)."""
    cs = R1CS()
    out1 = cs.new_instance_var()
    out2 = cs.new_instance_var()
    x = cs.new_witness_var()
    y = cs.new_witness_var()
    z = cs.new_witness_var()
    cs.enforce({x: 1}, {y: 1}, {out1: 1})
    cs.enforce({x: 1, y: 1}, {z: 1}, {out2: 1})
    cs.enforce({x: 1}, {x: 1}, {z: 1})
    cs = cs.finalized()

    def assignment(xv, yv):
        zv = xv * xv % R_MOD
        o1 = xv * yv % R_MOD
        o2 = (xv + yv) * zv % R_MOD
        return [1, o1, o2], [xv, yv, zv]

    return cs, assignment


@pytest.fixture(scope="module")
def toy_keys():
    cs, assignment = build_toy_circuit()
    na, nb, nc = cs.nnz()
    srs = indexer.generate_universal_srs(
        cs.num_constraints, cs.num_variables, max(na, nb, nc), rng
    )
    pk = indexer.index(cs, srs)
    return cs, assignment, pk


def test_r1cs_satisfied():
    cs, assignment = build_toy_circuit()
    inst, wit = assignment(3, 5)
    assert cs.is_satisfied(inst + wit)
    bad = list(wit)
    bad[0] = (bad[0] + 1) % R_MOD
    assert not cs.is_satisfied(inst + bad)


@pytest.mark.slow
def test_marlin_prove_verify_zk(toy_keys):
    cs, assignment, pk = toy_keys
    inst, wit = assignment(7, 11)
    proof = prover.prove(pk, inst, wit, rng=rng, zk=True)
    assert verifier.verify(pk.vk, inst, proof)


@pytest.mark.slow
def test_marlin_prove_verify_non_zk(toy_keys):
    cs, assignment, pk = toy_keys
    inst, wit = assignment(2, 9)
    proof = prover.prove(pk, inst, wit, rng=rng, zk=False)
    assert verifier.verify(pk.vk, inst, proof)


@pytest.mark.slow
def test_marlin_rejects_wrong_instance(toy_keys):
    cs, assignment, pk = toy_keys
    inst, wit = assignment(4, 6)
    proof = prover.prove(pk, inst, wit, rng=rng, zk=True)
    bad_inst = list(inst)
    bad_inst[1] = (bad_inst[1] + 1) % R_MOD
    assert not verifier.verify(pk.vk, bad_inst, proof)


@pytest.mark.slow
def test_marlin_rejects_tampered_proof(toy_keys):
    cs, assignment, pk = toy_keys
    inst, wit = assignment(8, 3)
    proof = prover.prove(pk, inst, wit, rng=rng, zk=True)
    proof.evals_beta1[1] = (proof.evals_beta1[1] + 1) % R_MOD
    assert not verifier.verify(pk.vk, inst, proof)


@pytest.mark.slow
def test_marlin_zk_proofs_differ(toy_keys):
    """Two proofs of the same statement must differ (hiding randomness)."""
    cs, assignment, pk = toy_keys
    inst, wit = assignment(5, 5)
    p1 = prover.prove(pk, inst, wit, rng=random.Random(1), zk=True)
    p2 = prover.prove(pk, inst, wit, rng=random.Random(2), zk=True)
    assert p1.comm_w.point != p2.comm_w.point
    assert p1.evals_beta1[0] != p2.evals_beta1[0]
