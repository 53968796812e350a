"""AES oracle + circuit template tests (FIPS-197 vectors, satisfiability).

Mirrors the reference test strategy (SURVEY.md §4): round-by-round
intermediate states (tests/integration_tests.rs:49-310 drives the same
FIPS-197 Appendix B example), gadget-level satisfiability, and negative
cases."""

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import aes_host

MSG = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
KEY = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")


def test_fips197_round_by_round():
    rks = aes_host.derive_round_keys(np.frombuffer(KEY, np.uint8))
    trace = aes_host.encrypt_block_trace(np.frombuffer(MSG, np.uint8), rks)
    # FIPS-197 Appendix B round 1 intermediates (trace index 0 = the state
    # entering round 1, i.e. after the initial AddRoundKey) and round 2 start
    assert bytes(trace["start"][0]).hex() == "193de3bea0f4e22b9ac68d2ae9f84808"
    assert bytes(trace["after_sub"][0]).hex() == (
        "d42711aee0bf98f1b8b45de51e415230"
    )
    assert bytes(trace["after_shift"][0]).hex() == (
        "d4bf5d30e0b452aeb84111f11e2798e5"
    )
    assert bytes(trace["after_mix"][0]).hex() == (
        "046681e5e0cb199a48f8d37a2806264c"
    )
    assert bytes(trace["start"][1]).hex() == "a49c7ff2689f352b6b5bea43026a5049"
    assert bytes(trace["ciphertext"]).hex() == (
        "3925841d02dc09fbdc118597196a0b32"
    )


def test_fips197_key_schedule_last_round_key():
    """Reference: aes.rs:347-363 asserts the round-10 key."""
    rks = aes_host.derive_round_keys(np.frombuffer(KEY, np.uint8))
    assert bytes(rks[10]).hex() == "d014f9a8c9ee2589e13f0cc8b6630ca6"


def test_multi_block_ecb_determinism():
    """Repeated blocks give repeated ciphertext blocks (ECB; reference
    tests/integration_tests.rs:339-372)."""
    msg = MSG * 4
    ct = aes_host.encrypt_ecb(msg, KEY)
    blocks = ct.reshape(4, 16)
    assert all(bytes(b) == bytes(blocks[0]) for b in blocks)


@pytest.fixture(scope="module")
def template16():
    from aes_zero_knowledge_proof_circuit_tpu.api import _template_cached

    return _template_cached(16)


@pytest.mark.slow
def test_template_witness_satisfies(template16):
    tpl = template16
    z = tpl.witness_z(MSG, KEY)
    assert tpl.r1cs.is_satisfied([int(v) for v in z])
    ct_bits = z[1 : tpl.r1cs.num_instance].reshape(16, 8)
    ct = (ct_bits * (1 << np.arange(8))).sum(1).astype(np.uint8)
    assert bytes(ct).hex() == "3925841d02dc09fbdc118597196a0b32"


@pytest.mark.slow
def test_template_jax_witness_matches_host(template16):
    tpl = template16
    from aes_zero_knowledge_proof_circuit_tpu.api import _witness_bits

    host_z = tpl.witness_z(MSG, KEY)
    jax_z = _witness_bits(tpl, MSG, KEY, backend="jax")
    assert np.array_equal(host_z, jax_z)


@pytest.mark.slow
def test_template_rejects_tampered_witness(template16):
    tpl = template16
    z = [int(v) for v in tpl.witness_z(MSG, KEY)]
    z[tpl.r1cs.num_instance + 5] ^= 1
    assert not tpl.r1cs.is_satisfied(z)


@pytest.mark.slow
def test_template_stage_log(template16):
    """Constraint-count observability (reference
    debug_constraint_system_status, src/helpers/mod.rs:66-82)."""
    tpl = template16
    stages = dict(tpl.stage_log)
    assert "After allocating the message" in stages
    assert "After enforcing ciphertext equality" in stages
    final = tpl.stage_log[-1][1]
    assert final["num_constraints"] == tpl.r1cs.num_constraints
    assert final["num_instance_variables"] == 129  # 1 + 16*8
