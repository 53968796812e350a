"""Standalone u32 witness-operation demos (reference parity: src/ops.rs).

The reference ships demo circuits `xor` and `add` over 32-bit words
(src/ops.rs:8-29) exercised by tests with seeded RNG inputs
(src/ops.rs:31-74). Here the same gadget layer that powers the AES circuit
builds them; values run through the vectorized witness plan.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..models.gadgets import Synth, word_xor
from ..models.r1cs import R1CS
from ..models.witness_plan import CompiledPlan


def build_u32_xor() -> Tuple[R1CS, CompiledPlan]:
    """Circuit: w = a XOR b over u32 witnesses (src/ops.rs:8-18)."""
    sy = Synth()
    a = tuple(sy.alloc_input_bit("a", i) for i in range(32))
    b = tuple(sy.alloc_input_bit("b", i) for i in range(32))
    out = word_xor(sy, a, b)
    for bit in out:
        inst = sy.alloc_instance_bit(bit)
    r1cs = sy.cs.finalized()
    return r1cs, sy.plan.compile(r1cs)


def build_u32_add() -> Tuple[R1CS, CompiledPlan]:
    """Circuit: w = a + b (mod 2^32) via ripple-carry bytes
    (src/ops.rs:20-29 / helpers add truth table src/helpers/mod.rs:11-42)."""
    sy = Synth()
    a = tuple(sy.alloc_input_bit("a", i) for i in range(32))
    b = tuple(sy.alloc_input_bit("b", i) for i in range(32))
    out = []
    carry_in = None
    # 32-bit ripple add built from the same full-adder chain as the AES
    # gmix multiply; process as four bytes LSB-first with carry chaining
    from ..models.gadgets import Bool

    carry = Bool.const(0)
    bits = []
    for ai, bi in zip(a, b):
        s = sy.b_xor(sy.b_xor(carry, ai), bi)
        and_ab = sy.b_and(ai, bi)
        or_ab = sy.b_or(ai, bi)
        carry = sy.b_or(sy.b_and(carry.negate(), and_ab),
                        sy.b_and(carry, or_ab))
        bits.append(s)
    for bit in bits:
        sy.alloc_instance_bit(bit)
    r1cs = sy.cs.finalized()
    return r1cs, sy.plan.compile(r1cs)


def run_u32_circuit(r1cs: R1CS, plan: CompiledPlan, a: int, b: int) -> int:
    """Evaluate the witness plan and return the public 32-bit result."""
    to_bits = lambda v: np.asarray([(v >> i) & 1 for i in range(32)], np.int32)
    z = plan.evaluate({"a": to_bits(a), "b": to_bits(b)})
    assert r1cs.is_satisfied([int(x) for x in z])
    out_bits = z[1 : r1cs.num_instance]
    return int(sum(int(v) << i for i, v in enumerate(out_bits)))
