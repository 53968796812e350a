"""Complete FIPS-197 Appendix B 10-round table, oracle AND template wires.

Reference parity: tests/integration_tests.rs:49-310 drives all 10 rounds
(start-of-round / after-subbytes / after-shiftrows / after-mixcolumns)
through its circuit gadgets. Here the same table (tests/fips197_vectors.py)
is asserted against BOTH:
  * the vectorized oracle trace (ops/aes_host.encrypt_block_trace), and
  * the circuit template's actual wire values (build_template(probe=True)
    decoded from the evaluated z vector) — the gadget-level value
    assertions of aes_circuit.rs:696-847.
"""

import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import aes_host
from tests.fips197_vectors import (
    AFTER_MIXCOLUMNS,
    AFTER_SHIFTROWS,
    AFTER_SUBBYTES,
    EXPECTED_OUTPUT,
    KEY,
    PLAINTEXT,
    START_OF_ROUND,
)


def test_fips197_all_rounds_oracle_trace():
    rks = aes_host.derive_round_keys(np.frombuffer(KEY, np.uint8))
    trace = aes_host.encrypt_block_trace(
        np.frombuffer(PLAINTEXT, np.uint8), rks
    )
    for rnd in range(10):
        assert bytes(trace["start"][rnd]) == START_OF_ROUND[rnd], (
            f"start of round {rnd + 1}"
        )
        assert bytes(trace["after_sub"][rnd]) == AFTER_SUBBYTES[rnd], (
            f"after subbytes, round {rnd + 1}"
        )
        assert bytes(trace["after_shift"][rnd]) == AFTER_SHIFTROWS[rnd], (
            f"after shiftrows, round {rnd + 1}"
        )
        if rnd < 9:  # round 10 has no mix_columns
            assert bytes(trace["after_mix"][rnd]) == AFTER_MIXCOLUMNS[rnd], (
                f"after mixcolumns, round {rnd + 1}"
            )
    assert bytes(trace["ciphertext"]) == EXPECTED_OUTPUT
    assert START_OF_ROUND[10] == EXPECTED_OUTPUT


@pytest.mark.slow
def test_fips197_all_rounds_template_wires():
    """The TEMPLATE's wire values — not just the oracle — carry the
    FIPS-197 states round for round."""
    from aes_zero_knowledge_proof_circuit_tpu.models.aes_circuit import (
        build_template,
    )

    tpl = build_template(16, probe=True)
    z = tpl.witness_z(PLAINTEXT, KEY)
    assert tpl.r1cs.is_satisfied([int(v) for v in z])
    # probes: start[0..10] (start of round r+1; start[10] = ciphertext),
    # after_sub[0..9], after_shift[0..9], after_mix[0..8]
    for rnd in range(10):
        assert tpl.probe_bytes("start", rnd, z) == START_OF_ROUND[rnd], (
            f"template start of round {rnd + 1}"
        )
        assert tpl.probe_bytes("after_sub", rnd, z) == AFTER_SUBBYTES[rnd], (
            f"template after subbytes, round {rnd + 1}"
        )
        assert tpl.probe_bytes("after_shift", rnd, z) == (
            AFTER_SHIFTROWS[rnd]
        ), f"template after shiftrows, round {rnd + 1}"
        if rnd < 9:
            assert tpl.probe_bytes("after_mix", rnd, z) == (
                AFTER_MIXCOLUMNS[rnd]
            ), f"template after mixcolumns, round {rnd + 1}"
    assert tpl.probe_bytes("start", 10, z) == EXPECTED_OUTPUT
