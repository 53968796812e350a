"""Pallas TPU kernels for the f32-digit field engine (the hot-op tier).

The XLA formulation of one Montgomery mul (field_f32.F32Ops.mul) round-trips
~60 elementwise temporaries of [N, 2D] f32 through HBM — measured 14.9 ms
for 2^18 Fq muls on v5e, i.e. HBM-bandwidth-bound, not compute-bound. These
kernels keep every temporary in VMEM: per tile the traffic is one read of
the operands and one write of the product, a ~20x reduction.

Exactness strategy (differs from the XLA path's Precision.HIGHEST):
  * digits are strictly normalized to [-1, 256] with THREE floor-carry
    rounds before every matmul — every such value is exactly representable
    in bfloat16 (integers up to 2^8);
  * the Toeplitz REDC matrices hold 8-bit digits (0..255), also bf16-exact;
  * MXU matmuls run with explicit bf16 inputs and f32 accumulation —
    single-pass (6x faster than the HIGHEST 6-pass emulation) yet exact,
    because every product <= 256*255 and every dot row sums < 2^24.
The result is bit-identical to F32Ops.mul (tests/test_pallas_field.py).

Reference analog: ark-ff Montgomery multiplication — the foundation of the
entire proving stack (SURVEY.md §2b ark-ff row, §7 step 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_f32 import F32Ops


def _norm_val(cols: jnp.ndarray, rounds: int) -> jnp.ndarray:
    """Floor-carry digit normalization on a VMEM value (no HBM traffic).

    Mosaic note: only non-negative static indices — negative indexing
    lowers to dynamic_slice, which Pallas TPU does not implement."""
    d = cols.shape[-1]
    for _ in range(rounds):
        carry = jnp.floor(cols * (1.0 / 256.0))
        digit = cols - carry * 256.0
        cols = digit + jnp.concatenate(
            [jnp.zeros_like(carry[..., 0:1]), carry[..., 0 : d - 1]],
            axis=-1,
        )
    return cols


def _bf16_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact integer matmul on the MXU: bf16 inputs (values in [-1, 256]),
    f32 accumulation."""
    return jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _conv_loop(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook digit convolution t[k] = sum_j a[j] b[k-j] as an
    in-kernel fori_loop with pltpu.roll (dynamic lane rotate).

    The unrolled pad-ladder keeps ~D live [rows, 2D] buffers on Mosaic's
    stack (9+ MB at 128 rows, D=50 — the VMEM wall that capped the MSM
    kernel's lane count); this loop formulation carries ONE accumulator.
    a's upper D lanes are zero, so a cyclic roll by j < D never wraps
    nonzero digits."""
    from jax.experimental.pallas import tpu as _pltpu

    d = a.shape[-1]
    # tpu.dynamic_rotate needs a 128-aligned lane dim; rolling by j < d
    # keeps a's nonzero digits inside [j, j+d) — no cyclic wrap into the
    # live region — and the result is sliced back to 2d columns.
    width = -(-2 * d // 128) * 128
    a_pad = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, width - d)])
    lane = jax.lax.broadcasted_iota(jnp.int32, b.shape, b.ndim - 1)

    def body(j, t):
        # b[:, j] via iota-mask reduce (Mosaic has no value dynamic_slice)
        bj = jnp.sum(jnp.where(lane == j, b, 0.0), axis=-1, keepdims=True)
        return t + _pltpu.roll(a_pad * bj, j, axis=a.ndim - 1)

    t0 = jnp.zeros(a.shape[:-1] + (width,), jnp.float32)
    return jax.lax.fori_loop(0, d, body, t0)[..., : 2 * d]


def mul_digits_loop(a: jnp.ndarray, b: jnp.ndarray, tn_prime: jnp.ndarray,
                    tn: jnp.ndarray, two_n: jnp.ndarray, inv_2n: float,
                    carry_w: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product with the loop-conv (same contract as
    mul_digits; VMEM-lean for wide-row kernels)."""
    d = a.shape[-1]
    t = _norm_val(_conv_loop(a, b), 3)
    m = _bf16_dot(t[..., :d], tn_prime)
    m = _norm_val(m, 3)
    mn = _bf16_dot(m, tn)
    v = _norm_val(t + mn, 3)
    carry = jnp.round(jnp.sum(v[..., 0:d] * carry_w, axis=-1))
    hi = v[..., d : 2 * d]
    hi = jnp.concatenate(
        [hi[..., 0:1] + carry[..., None], hi[..., 1:d]], axis=-1
    )
    est = (
        hi[..., d - 1] * 16777216.0
        + hi[..., d - 2] * 65536.0
        + hi[..., d - 3] * 256.0
        + hi[..., d - 4]
    ) * inv_2n
    mm = jnp.maximum(jnp.floor(est) - 1.0, 0.0)
    out = hi - mm[..., None] * two_n
    return _norm_val(out, 2)


def mul_digits(a: jnp.ndarray, b: jnp.ndarray, tn_prime: jnp.ndarray,
               tn: jnp.ndarray, two_n: jnp.ndarray, inv_2n: float,
               carry_w: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product of fold-range digit tensors — pure value math,
    traceable inside a Pallas kernel (all refs already loaded)."""
    d = a.shape[-1]
    # schoolbook convolution t[k] = sum_j a[j] b[k-j] in VMEM
    t = jnp.zeros(a.shape[:-1] + (2 * d,), jnp.float32)
    for j in range(d):
        t = t + jnp.pad(
            a * b[..., j : j + 1],
            [(0, 0)] * (a.ndim - 1) + [(j, d - j)],
        )
    t = _norm_val(t, 3)                       # digits in [-1, 256]
    m = _bf16_dot(t[..., :d], tn_prime)
    m = _norm_val(m, 3)
    mn = _bf16_dot(m, tn)
    v = _norm_val(t + mn, 3)
    carry = jnp.round(jnp.sum(v[..., 0:d] * carry_w, axis=-1))
    hi = v[..., d : 2 * d]
    hi = jnp.concatenate(
        [hi[..., 0:1] + carry[..., None], hi[..., 1:d]], axis=-1
    )
    # fold to the engine's [0, ~6N) band (positive static indices only)
    est = (
        hi[..., d - 1] * 16777216.0
        + hi[..., d - 2] * 65536.0
        + hi[..., d - 3] * 256.0
        + hi[..., d - 4]
    ) * inv_2n
    mm = jnp.maximum(jnp.floor(est) - 1.0, 0.0)
    out = hi - mm[..., None] * two_n
    return _norm_val(out, 2)


def _mul_kernel(a_ref, b_ref, tnp_ref, tn_ref, twon_ref, cw_ref, out_ref,
                *, inv_2n: float):
    out_ref[:] = mul_digits(
        a_ref[:], b_ref[:], tnp_ref[:], tn_ref[:], twon_ref[:],
        inv_2n, cw_ref[:],
    )


@functools.lru_cache(maxsize=None)
def _mul_call(d: int, n_rows: int, tile: int, inv_2n: float, interpret: bool):
    grid = (n_rows // tile,)
    row_spec = pl.BlockSpec((tile, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mul_kernel, inv_2n=inv_2n),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            const(d, d),
            const(d, 2 * d),
            const(1, d),
            const(1, d),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        interpret=interpret,
    )


def _tile_for(n: int, d: int) -> int:
    # Mosaic stack-allocates the conv's value chain; measured ~24.5MB at
    # tile=1024 (Fq, d=50) vs the 16MB VMEM limit — 256 keeps ~6MB headroom.
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def _butterfly_kernel(l_ref, r_ref, tw_ref, tnp_ref, tn_ref, twon_ref,
                      c16n_ref, cw_ref, hi_ref, lo_ref, *, inv_2n: float):
    """Fused NTT butterfly: t = r*tw; hi = l + t; lo = l - t.

    One VMEM pass per tile — the butterfly's three HBM arrays are read
    once and its two outputs written once; the ~60 mul temporaries plus
    the add/sub never touch HBM (the XLA path materializes the product
    and re-reads it twice)."""
    left = l_ref[:]
    prod = mul_digits(
        r_ref[:], tw_ref[:], tnp_ref[:], tn_ref[:], twon_ref[:],
        inv_2n, cw_ref[:],
    )
    two_n = twon_ref[:]
    c16n = c16n_ref[:]
    d = left.shape[-1]

    def fold(x):
        est = (
            x[..., d - 1] * 16777216.0
            + x[..., d - 2] * 65536.0
            + x[..., d - 3] * 256.0
            + x[..., d - 4]
        ) * inv_2n
        m = jnp.maximum(jnp.floor(est) - 1.0, 0.0)
        return _norm_val(x - m[..., None] * two_n, 2)

    hi_ref[:] = fold(left + prod)
    lo_ref[:] = fold(left - prod + c16n)


@functools.lru_cache(maxsize=None)
def _butterfly_call(d: int, n_rows: int, tile: int, inv_2n: float,
                    interpret: bool):
    grid = (n_rows // tile,)
    row_spec = pl.BlockSpec((tile, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_butterfly_kernel, inv_2n=inv_2n),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            const(d, d),
            const(d, 2 * d),
            const(1, d),
            const(1, d),
            const(1, d),
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        ],
        interpret=interpret,
    )


def pallas_butterfly(ops: F32Ops, left: jnp.ndarray, right: jnp.ndarray,
                     tw: jnp.ndarray, interpret: bool = False):
    """(left + right*tw, left - right*tw) over [N, D] digit tensors —
    the radix-2 NTT stage, fused into a single Pallas pass. Same digit
    band as (F32Ops.add, F32Ops.sub) of the product; bit-exact vs the
    XLA composition (tests/test_pallas_field.py)."""
    shape = left.shape
    d = ops.D
    fl = left.reshape(-1, d)
    fr = right.reshape(-1, d)
    ft = jnp.broadcast_to(tw, right.shape).reshape(-1, d)
    n = fl.shape[0]
    tile = _tile_for(n, d)
    pad = (-n) % tile
    if pad:
        fl = jnp.pad(fl, [(0, pad), (0, 0)])
        fr = jnp.pad(fr, [(0, pad), (0, 0)])
        ft = jnp.pad(ft, [(0, pad), (0, 0)])
    call = _butterfly_call(d, n + pad, tile, ops.inv_2n_scaled, interpret)
    hi, lo = call(
        fl, fr, ft, ops.t_nprime, ops.t_n,
        ops.two_n.reshape(1, d), ops.c16n.reshape(1, d),
        ops.carry_w.reshape(1, d),
    )
    if pad:
        hi, lo = hi[:n], lo[:n]
    return hi.reshape(shape), lo.reshape(shape)


def pallas_mul(ops: F32Ops, a: jnp.ndarray, b: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Drop-in Montgomery mul: same contract as F32Ops.mul, Pallas-fused.

    a, b: [N, D] fold-range digit tensors (broadcasting of a [D] operand is
    handled by expansion)."""
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    d = ops.D
    flat_a = a.reshape(-1, d)
    flat_b = b.reshape(-1, d)
    n = flat_a.shape[0]
    tile = _tile_for(n, d)
    pad = (-n) % tile
    if pad:
        flat_a = jnp.pad(flat_a, [(0, pad), (0, 0)])
        flat_b = jnp.pad(flat_b, [(0, pad), (0, 0)])
    call = _mul_call(d, n + pad, tile, ops.inv_2n_scaled, interpret)
    out = call(
        flat_a, flat_b, ops.t_nprime, ops.t_n,
        ops.two_n.reshape(1, d), ops.carry_w.reshape(1, d),
    )
    if pad:
        out = out[:n]
    return out.reshape(shape)
