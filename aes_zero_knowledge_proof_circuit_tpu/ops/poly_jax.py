"""Device-side polynomial toolbox over Fr f32-digit tensors.

The JAX counterpart of ops/poly_host.py used by the TPU Marlin prover
(marlin/prover_jax.py). A "dpoly" is a [len, D] float32 digit tensor of
Montgomery-form coefficients (low -> high). Everything composes the f32
field engine, the NTT engines, and constant-shape scans; no host round-trips
on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .field_f32 import fr_f32, ints_to_digits
from .ntt_jax import ntt_engine

F = fr_f32()
D = F.D


def dpoly(ints) -> jnp.ndarray:
    """Host ints -> device Montgomery digit coefficients."""
    return jnp.asarray(ints_to_digits(F, ints))


def scalar(v: int) -> jnp.ndarray:
    """Host int -> [D] Montgomery digit vector."""
    return jnp.asarray(ints_to_digits(F, [v])[0])


def pad_to(p: jnp.ndarray, n: int) -> jnp.ndarray:
    assert p.shape[0] <= n, (p.shape, n)
    return jnp.pad(p, ((0, n - p.shape[0]), (0, 0)))


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    n = max(p.shape[0], q.shape[0])
    return F.add(pad_to(p, n), pad_to(q, n))


def sub(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    n = max(p.shape[0], q.shape[0])
    return F.sub(pad_to(p, n), pad_to(q, n))


def scale(p: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return F.mul(p, s[None, :])


def ntt_to(log_n: int, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a dpoly (len <= 2^log_n) on the canonical 2^log_n domain."""
    eng = ntt_engine(log_n)
    return eng.ntt(pad_to(coeffs, eng.n))


def intt(log_n: int, evals: jnp.ndarray) -> jnp.ndarray:
    return ntt_engine(log_n).intt(evals)


def ntt_coset(log_n: int, coeffs: jnp.ndarray, g: int) -> jnp.ndarray:
    """Evaluate a dpoly on the coset g*<w_n>: scale coeff i by g^i, NTT.

    The coset trick lets round-3 compute h2 = (a - b f)/v_K directly on 2k
    points instead of materializing the 3k-degree product b*f on a 4k
    domain — the 2^21+ tensors there were the prover's OOM site."""
    from .field_params import R_MOD

    eng = ntt_engine(log_n)
    pw = powers(scalar(g % R_MOD), eng.n)
    return eng.ntt(F.mul(pad_to(coeffs, eng.n), pw))


def intt_coset(log_n: int, evals: jnp.ndarray, g: int) -> jnp.ndarray:
    """Interpolate from evaluations on g*<w_n> (exact for deg < 2^log_n)."""
    from .field_params import R_MOD, inv_mod

    eng = ntt_engine(log_n)
    pw = powers(scalar(inv_mod(g % R_MOD, R_MOD)), eng.n)
    return F.mul(eng.intt(evals), pw)


def mul_polys(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Coefficient product via NTT (output length = len(p)+len(q)-1)."""
    out_len = p.shape[0] + q.shape[0] - 1
    log_n = max(1, (out_len - 1).bit_length())
    fp = ntt_to(log_n, p)
    fq = ntt_to(log_n, q)
    return intt(log_n, F.mul(fp, fq))[:out_len]


def tree_sum(vals: jnp.ndarray) -> jnp.ndarray:
    """Sum along axis 0 (mod r): constant-shape suffix scan, element 0."""
    from .scan_utils import hillis_scan

    return hillis_scan(F.add, vals, reverse=True)[0]


def powers(z: jnp.ndarray, n: int) -> jnp.ndarray:
    """[n, D]: 1, z, z^2, ..., z^(n-1) via log-depth scan."""
    from .scan_utils import hillis_scan

    base = jnp.broadcast_to(z, (n, D)).astype(jnp.float32)
    first = jnp.broadcast_to(F.one_mont, (1, D)).astype(jnp.float32)
    seq = jnp.concatenate([first, base[: n - 1]], axis=0)
    return hillis_scan(F.mul, seq)


def eval_at(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """p(z) for device point z ([D] Montgomery digits); returns [D]."""
    pw = powers(z, p.shape[0])
    return tree_sum(F.mul(p, pw))


def div_vanishing(p: jnp.ndarray, m: int):
    """Divide by X^m - 1: returns (quotient, remainder[m]).

    Block suffix-sum formulation (h_{km+i} = sum_{l>k} p_{lm+i}), log-depth.
    """
    n = p.shape[0]
    if n <= m:
        return jnp.zeros((1, D), jnp.float32), pad_to(p, m)
    from .scan_utils import hillis_scan

    blocks = -(-n // m)
    p_pad = pad_to(p, blocks * m).reshape(blocks, m, D)
    suffix = hillis_scan(F.add, p_pad, reverse=True)
    h = suffix[1:].reshape((blocks - 1) * m, D)
    rem = F.add(p_pad[0], suffix[1])
    return h, rem


def segment_sum_mod(values: jnp.ndarray, seg_ids: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Modular segment sum of [N, D] Montgomery digit elements by [N] ids.

    Digits (< 2^10) cast to int32 and integer-segment-summed (exact for
    N < 2^20), then the widened column sums fold back into fold-range
    Montgomery digits:   V = V_lo + R * V_hi,  V_hi * R = mul(V_hi, R^2).
    """
    n = values.shape[0]
    assert n < (1 << 21)
    ints = values.astype(jnp.int32)
    # digits can be slightly negative (fold leaves a band ~(-2, 260));
    # byte-splitting needs non-negative sums, so sum the positive and
    # negative parts separately and subtract in the field
    pos = jax.ops.segment_sum(jnp.maximum(ints, 0), seg_ids,
                              num_segments=num_segments)
    neg = jax.ops.segment_sum(jnp.maximum(-ints, 0), seg_ids,
                              num_segments=num_segments)

    def fold_sums(sums):
        # columns < 2^10 * N < 2^31; byte-split in integer space (f32 would
        # round above 2^24), accumulate on a width-2D grid
        width = 2 * D
        grid = jnp.zeros((num_segments, width), jnp.float32)
        for shift in range(4):
            part = ((sums >> (8 * shift)) & 0xFF).astype(jnp.float32)
            grid = grid + jnp.pad(part, ((0, 0), (shift, width - D - shift)))
        grid = F._norm(grid)
        v_lo = grid[..., :D]
        v_hi = grid[..., D:]                          # exactly D columns
        hi_part = F.mul(v_hi, F.r2_digits[None, :])   # V_hi * R mod r
        return F.add(F._fold(v_lo), hi_part)

    return F.sub(fold_sums(pos), fold_sums(neg))