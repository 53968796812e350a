"""u32 xor/add demo circuits (reference src/ops.rs parity)."""

import random

from aes_zero_knowledge_proof_circuit_tpu.models.ops_demo import (
    build_u32_add,
    build_u32_xor,
    run_u32_circuit,
)

rng = random.Random(3)


def test_u32_xor_circuit():
    r1cs, plan = build_u32_xor()
    for _ in range(5):
        a, b = rng.getrandbits(32), rng.getrandbits(32)
        assert run_u32_circuit(r1cs, plan, a, b) == a ^ b


def test_u32_add_circuit():
    r1cs, plan = build_u32_add()
    for _ in range(5):
        a, b = rng.getrandbits(32), rng.getrandbits(32)
        assert run_u32_circuit(r1cs, plan, a, b) == (a + b) % (1 << 32)
