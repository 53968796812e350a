"""AES-128-CBC circuit (the reference's roadmap capability,
tests/integration_tests.rs:1)."""

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import aes_host

MSG = bytes.fromhex("3243f6a8885a308d313198a2e0370734") * 2
KEY = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
IV = bytes(range(16))


def test_cbc_oracle_chains_blocks():
    ct = aes_host.encrypt_cbc(MSG, KEY, IV)
    # block 0 = E(m0 ^ iv), block 1 = E(m1 ^ c0)
    b0 = aes_host.encrypt_ecb(bytes(np.frombuffer(MSG[:16], np.uint8)
                                    ^ np.frombuffer(IV, np.uint8)), KEY)
    assert bytes(ct[:16]) == bytes(b0)
    b1 = aes_host.encrypt_ecb(bytes(np.frombuffer(MSG[16:], np.uint8)
                                    ^ ct[:16]), KEY)
    assert bytes(ct[16:]) == bytes(b1)
    # identical plaintext blocks produce different ciphertext blocks
    assert bytes(ct[:16]) != bytes(ct[16:])


@pytest.mark.slow
def test_cbc_template_satisfies():
    from aes_zero_knowledge_proof_circuit_tpu.models.aes_circuit import (
        build_template,
    )

    tpl = build_template(32, mode="cbc")
    assert tpl.r1cs.num_instance == 1 + 128 + 32 * 8  # one + IV + ct bits
    z = tpl.witness_z(MSG, KEY, iv=IV)
    assert tpl.r1cs.is_satisfied([int(v) for v in z])
    ct_bits = z[129 : tpl.r1cs.num_instance].reshape(32, 8)
    ct = (ct_bits * (1 << np.arange(8))).sum(1).astype(np.uint8)
    assert bytes(ct) == bytes(aes_host.encrypt_cbc(MSG, KEY, IV))
    # wrong IV in the instance must not satisfy
    bad = [int(v) for v in z]
    bad[1] ^= 1
    assert not tpl.r1cs.is_satisfied(bad)
