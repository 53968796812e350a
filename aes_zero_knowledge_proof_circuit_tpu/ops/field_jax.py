"""Vectorized Montgomery field arithmetic in JAX — the TPU compute foundation.

TPU-native equivalent of ark-ff's Montgomery arithmetic (SURVEY.md §2b:
"Non-native limb arithmetic kernels — the foundation of everything above").

Representation: [..., L] uint32 tensors of 16-bit limbs (little-endian),
values kept in Montgomery form (a * R mod N, R = 2^(16 L)). All ops are
batch-vectorized over the leading axes; limb loops are static Python loops
(unrolled at trace time) so XLA sees straight-line vector code for the VPU.

Overflow discipline (TPU has no int64):
* 16x16-bit limb products fit uint32 exactly.
* partial products are split lo/hi-16 before accumulation; every accumulator
  limb stays < 2^23 (bounded by <= 2L additions of < 2^16), so uint32 never
  wraps and one ascending carry pass normalizes exactly.

Every function has a bit-exact host oracle in field_host/field_params,
cross-checked in tests/test_field_jax.py (SURVEY.md §4 test translation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import init_jax_compilation_cache
from .field_params import (
    LIMB_BITS,
    LIMB_MASK,
    MontgomeryCtx,
    fq_ctx,
    fr_ctx,
)
from .limbs import int_to_limbs

init_jax_compilation_cache()

MASK = jnp.uint32(LIMB_MASK)


class FieldOps:
    """Field arithmetic bound to one Montgomery context (Fr or Fq)."""

    def __init__(self, ctx: MontgomeryCtx):
        self.ctx = ctx
        self.L = ctx.n_limbs
        self.mod_limbs = jnp.asarray(int_to_limbs(ctx.modulus, self.L))
        self.n0p = jnp.uint32(ctx.n0_prime)
        self.one_mont = jnp.asarray(int_to_limbs(ctx.R_mod, self.L))
        self.zero = jnp.zeros((self.L,), jnp.uint32)
        # jit the hot entry points: eager dispatch of the unrolled limb ops
        # is pathological (hundreds of tiny kernels), and on the axon TPU
        # tunnel each eager op is a network round-trip.
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = jax.jit(self.mul)
        self.inv = jax.jit(self.inv)
        # batch_inv stays eager: its Hillis-Steele levels call the jitted
        # mul so nothing large reaches the XLA compiler

    # -- add / sub ---------------------------------------------------------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a + b) mod N, limbwise with carry pass + conditional subtract."""
        t = a + b  # each limb < 2^17
        t, top = _carry_pass(t, self.L)
        return _cond_sub_mod(t, top, self.mod_limbs, self.L)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a - b) mod N."""
        d, borrow = _sub_borrow(a, b, self.L)
        # if borrowed, add N back
        t = d + jnp.where(borrow[..., None] != 0, self.mod_limbs, 0).astype(jnp.uint32)
        t, _ = _carry_pass(t, self.L)
        return t

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        d, _ = _sub_borrow(jnp.broadcast_to(self.mod_limbs, a.shape), a, self.L)
        return jnp.where(is_zero, 0, d).astype(jnp.uint32)

    # -- Montgomery multiply ----------------------------------------------

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: (a * b * R^-1) mod N; both operands and the
        result in Montgomery form.

        The limb loops are lax.fori_loop with dynamic_update_slice windows so
        the traced graph is O(1) in L — XLA:CPU compile time explodes on the
        unrolled form inside associative_scan (scatters and large bodies),
        while the loop body amortizes over the batch at runtime.
        """
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        batch = a.shape[:-1]
        pad_batch = [(0, 0)] * len(batch)
        cols = jnp.zeros(batch + (2 * L + 1,), jnp.uint32)

        # ---- schoolbook product into 2L+1 columns (lo/hi split) ----------
        def pbody(j, cols):
            bj = jax.lax.dynamic_index_in_dim(b, j, axis=-1, keepdims=True)
            p = a * bj                           # uint32 exact
            lo = p & MASK
            hi = p >> LIMB_BITS
            # lo at columns j..j+L-1, hi at j+1..j+L -> window j..j+L
            seg = jax.lax.dynamic_slice_in_dim(cols, j, L + 1, axis=-1)
            seg = seg + jnp.pad(lo, pad_batch + [(0, 1)])
            seg = seg + jnp.pad(hi, pad_batch + [(1, 0)])
            starts = (0,) * len(batch) + (j,)
            return jax.lax.dynamic_update_slice(cols, seg, starts)

        cols = jax.lax.fori_loop(0, L, pbody, cols)  # each col < 2L*2^16

        # ---- REDC walking the low L columns ------------------------------
        def rbody(i, state):
            cols, carry = state
            t_i = jax.lax.dynamic_index_in_dim(cols, i, axis=-1,
                                               keepdims=False) + carry
            m = (t_i * self.n0p) & MASK
            p = m[..., None] * self.mod_limbs    # [.., L] uint32 exact
            lo = p & MASK
            hi = p >> LIMB_BITS
            low_sum = (t_i & MASK) + lo[..., 0]
            carry = (t_i >> LIMB_BITS) + (low_sum >> LIMB_BITS) + hi[..., 0]
            # lo[1:] at positions i+1..i+L-1, hi[1:] at i+2..i+L
            seg = jax.lax.dynamic_slice_in_dim(cols, i + 1, L, axis=-1)
            seg = seg + jnp.pad(lo[..., 1:], pad_batch + [(0, 1)])
            seg = seg + jnp.pad(hi[..., 1:], pad_batch + [(1, 0)])
            starts = (0,) * len(batch) + (i + 1,)
            return jax.lax.dynamic_update_slice(cols, seg, starts), carry

        cols, carry = jax.lax.fori_loop(
            0, L, rbody, (cols, jnp.zeros(batch, jnp.uint32))
        )
        res = cols[..., L : 2 * L + 1]
        res = jnp.concatenate(
            [(res[..., :1] + carry[..., None]), res[..., 1:]], axis=-1
        )
        res, top = _carry_pass_wide(res, L)
        return _cond_sub_mod(res, top, self.mod_limbs, L)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def pow_int(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e (e a python int), Montgomery in/out; static square-multiply."""
        result = jnp.broadcast_to(self.one_mont, a.shape).astype(jnp.uint32)
        base = a
        while e:
            if e & 1:
                result = self.mul(result, base)
            base = self.mul(base, base)
            e >>= 1
        return result

    def pow_int_loop(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e with a lax.fori_loop over the (static) exponent bits: the body
        traces ONE square+select-multiply, so compile cost is O(1) in the
        exponent size (pow_int unrolls and is only for small exponents)."""
        nbits = e.bit_length()
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], jnp.uint32
        )
        one = jnp.broadcast_to(self.one_mont, a.shape).astype(jnp.uint32)

        def body(i, acc):
            acc = self.mul(acc, acc)
            with_mul = self.mul(acc, a)
            return jnp.where((bits[i] == 1), with_mul, acc).astype(jnp.uint32)

        return jax.lax.fori_loop(0, nbits, body, one)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inverse a^(N-2) — fully batched (used for batch-inversion
        of denominator tensors in the prover; zero maps to zero)."""
        return self.pow_int_loop(a, self.ctx.modulus - 2)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond ? a : b with cond shaped [...] (no limb axis)."""
        return jnp.where(cond[..., None], a, b).astype(jnp.uint32)

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Inverse of every element of [N, L] via the Montgomery product
        trick in log-depth (prefix+suffix product scans + ONE Fermat
        inversion) instead of ~380 muls/element (zeros map to zero)."""
        from .scan_utils import hillis_scan

        is_zero = jnp.all(a == 0, axis=-1)
        one = jnp.broadcast_to(self.one_mont, a.shape).astype(jnp.uint32)
        safe = jnp.where(is_zero[..., None], one, a).astype(jnp.uint32)
        prefix = hillis_scan(self.mul, safe)
        suffix = hillis_scan(self.mul, safe, reverse=True)
        total_inv = self.inv(prefix[-1])
        # inv_i = prefix_{i-1} * suffix_{i+1} * total_inv
        p_shift = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
        s_shift = jnp.concatenate([suffix[1:], one[:1]], axis=0)
        out = self.mul(self.mul(p_shift, s_shift), total_inv)
        return jnp.where(is_zero[..., None], 0, out).astype(jnp.uint32)


def _carry_pass(t: jnp.ndarray, L: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ascending carry normalization for limbs < 2^31; returns (limbs, top)."""
    out = []
    carry = jnp.zeros(t.shape[:-1], jnp.uint32)
    for i in range(L):
        v = t[..., i] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _carry_pass_wide(t: jnp.ndarray, L: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Carry pass over L+1 limbs -> L limbs + top overflow."""
    out = []
    carry = jnp.zeros(t.shape[:-1], jnp.uint32)
    for i in range(L):
        v = t[..., i] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    top = t[..., L] + carry
    return jnp.stack(out, axis=-1), top


def _sub_borrow(a: jnp.ndarray, b: jnp.ndarray, L: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - b limbwise; returns (difference limbs, final borrow flag 0/1)."""
    out = []
    borrow = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), jnp.uint32)
    for i in range(L):
        # compute in uint32 with +2^16 bias to avoid negative wrap ambiguity
        v = (a[..., i] + jnp.uint32(1 << LIMB_BITS)) - b[..., i] - borrow
        out.append(v & MASK)
        borrow = jnp.uint32(1) - (v >> LIMB_BITS)  # 1 if we borrowed
    return jnp.stack(out, axis=-1), borrow


def _cond_sub_mod(t: jnp.ndarray, top: jnp.ndarray, mod_limbs: jnp.ndarray,
                  L: int) -> jnp.ndarray:
    """Subtract N when top overflow set or t >= N (t < 2N guaranteed)."""
    d, borrow = _sub_borrow(t, jnp.broadcast_to(mod_limbs, t.shape), L)
    need = jnp.logical_or(top > 0, borrow == 0)
    return jnp.where(need[..., None], d, t).astype(jnp.uint32)


@functools.lru_cache(maxsize=None)
def fr_ops() -> FieldOps:
    return FieldOps(fr_ctx())


@functools.lru_cache(maxsize=None)
def fq_ops() -> FieldOps:
    return FieldOps(fq_ctx())
