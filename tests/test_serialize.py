"""Serialization round-trips: proof, verifying key, SRS checkpoint."""

import random

import pytest

from aes_zero_knowledge_proof_circuit_tpu.marlin import indexer, prover, verifier
from aes_zero_knowledge_proof_circuit_tpu.ops import kzg
from aes_zero_knowledge_proof_circuit_tpu.utils import serialize as ser

rng = random.Random(77)


def test_srs_save_load(tmp_path):
    srs = kzg.setup(8, rng)
    path = str(tmp_path / "srs.npz")
    ser.save_srs(path, srs)
    back = ser.load_srs(path)
    assert back.max_degree == srs.max_degree
    assert all(a == b for a, b in zip(back.powers_g1, srs.powers_g1))
    assert all(a == b for a, b in zip(back.gamma_powers_g1, srs.gamma_powers_g1))
    assert back.h == srs.h and back.tau_h == srs.tau_h


@pytest.mark.slow
def test_proof_and_vk_roundtrip():
    from tests.test_marlin import build_toy_circuit

    cs, assignment = build_toy_circuit()
    na, nb, nc = cs.nnz()
    srs = indexer.generate_universal_srs(
        cs.num_constraints, cs.num_variables, max(na, nb, nc), rng
    )
    pk = indexer.index(cs, srs)
    inst, wit = assignment(2, 3)
    proof = prover.prove(pk, inst, wit, rng=rng, zk=True)

    blob = ser.serialize_proof(proof)
    back = ser.deserialize_proof(blob)
    assert ser.serialize_proof(back) == blob

    vk_blob = ser.serialize_vk(pk.vk)
    vk_back = ser.deserialize_vk(vk_blob)
    assert ser.serialize_vk(vk_back) == vk_blob

    # deserialized objects verify (and tampering is caught at parse time)
    assert verifier.verify(vk_back, inst, back)
    corrupted = bytearray(blob)
    corrupted[20] ^= 1
    with pytest.raises(Exception):
        bad = ser.deserialize_proof(bytes(corrupted))
        assert not verifier.verify(vk_back, inst, bad)


def test_ark_container_roundtrip():
    """Flag-gated ark-layout container: round-trips, parses generically, and
    the deserialized proof still verifies (utils/ark_container.py)."""
    from tests.test_marlin import build_toy_circuit

    from aes_zero_knowledge_proof_circuit_tpu.utils import ark_container as ac

    r = random.Random(78)
    cs, assignment = build_toy_circuit()
    na, nb, nc = cs.nnz()
    srs = indexer.generate_universal_srs(
        cs.num_constraints, cs.num_variables, max(na, nb, nc), r
    )
    pk = indexer.index(cs, srs)
    inst, wit = assignment(2, 3)
    proof = prover.prove(pk, inst, wit, rng=r, zk=True)

    blob = ac.proof_to_ark_bytes(proof)
    # arkworks derive framing: u64 LE round count leads the container
    assert blob[:8] == (3).to_bytes(8, "little")
    back = ac.proof_from_ark_bytes(blob)
    assert ac.proof_to_ark_bytes(back) == blob
    assert verifier.verify(pk.vk, inst, back)

    # the generic entry point auto-detects the ark layout
    assert ser.serialize_proof(ser.deserialize_proof(blob)) is not None

    # env flag routes serialize_proof through the ark layout
    import os

    os.environ["ZKAES_PROOF_CONTAINER"] = "ark"
    try:
        assert ser.serialize_proof(proof) == blob
    finally:
        del os.environ["ZKAES_PROOF_CONTAINER"]


def test_srs_truncation_reuse(tmp_path, monkeypatch):
    """A larger on-disk SRS checkpoint is reused by truncation: the
    degree-d prefix of a powers-of-tau SRS is a valid SRS for the same
    tau (api._find_larger_srs / api._truncate_srs)."""
    from aes_zero_knowledge_proof_circuit_tpu import api
    from aes_zero_knowledge_proof_circuit_tpu.utils.config import CONFIG

    monkeypatch.setattr(CONFIG, "cache_dir", str(tmp_path))
    srs = kzg.setup(64, rng)
    ser.save_srs(str(CONFIG.srs_dir / "srs_bls377_v2_d64.npz"), srs)

    found = api._find_larger_srs(16)
    assert found is not None and found.name == "srs_bls377_v2_d64.npz"
    assert api._find_larger_srs(65) is None

    small = api._truncate_srs(ser.load_srs(str(found)), 16)
    assert small.max_degree == 16
    assert len(small.powers_g1) == 17
    assert all(a == b for a, b in zip(small.powers_g1, srs.powers_g1))
    assert small.h == srs.h and small.tau_h == srs.tau_h

    # commit/open/check still consistent at the truncated degree
    coeffs = [rng.randrange(kzg.R_MOD) for _ in range(17)]
    comm, _ = kzg.commit(small, coeffs)
    z = rng.randrange(kzg.R_MOD)
    v = kzg.open_eval(coeffs, z)
    xi = rng.randrange(kzg.R_MOD)
    proof = kzg.batch_open(small, [(coeffs, 0, None)], z, xi)
    assert kzg.batch_check(
        small.verifier_part(), [comm], z, [v], proof, xi)
