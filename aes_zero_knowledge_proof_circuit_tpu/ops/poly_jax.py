"""Device-side polynomial toolbox over Fr limb tensors.

The JAX counterpart of ops/poly_host.py used by the TPU Marlin prover
(marlin/prover_jax.py). A "dpoly" is a [len, 16] uint32 Montgomery-form limb
tensor of coefficients (low -> high). Everything here composes the NTT
engines, field ops and log-depth scans; no host round-trips on the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field_jax import fr_ops
from .field_params import R_MOD, root_of_unity
from .limbs import to_mont
from .ntt_jax import ntt_engine

F = fr_ops()
L = F.L


def dpoly(ints) -> jnp.ndarray:
    """Host ints -> device Montgomery coefficients."""
    return jnp.asarray(to_mont(F.ctx, [v % R_MOD for v in ints]))


def scalar(v: int) -> jnp.ndarray:
    """Host int -> [L] Montgomery limb vector."""
    return jnp.asarray(to_mont(F.ctx, [v % R_MOD])[0])


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
    """[n, L]: 1, z, z^2, ..., z^(n-1) via log-depth scan."""
    from .scan_utils import hillis_scan

    base = jnp.broadcast_to(z, (n, L)).astype(jnp.uint32)
    first = jnp.broadcast_to(F.one_mont, (1, L)).astype(jnp.uint32)
    seq = jnp.concatenate([first, base[: n - 1]], axis=0)
    return hillis_scan(F.mul, seq)


def eval_at(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """p(z) for device point z ([L] Montgomery); returns [L]."""
    pw = powers(z, p.shape[0])
    return tree_sum(F.mul(p, pw))


def div_vanishing(p: jnp.ndarray, m: int):
    """Divide by X^m - 1: returns (quotient, remainder[m]).

    Block suffix-sum formulation (h_{km+i} = sum_{l>k} p_{lm+i}), log-depth.
    """
    n = p.shape[0]
    if n <= m:
        return jnp.zeros((1, L), jnp.uint32), pad_to(p, m)
    from .scan_utils import hillis_scan

    blocks = -(-n // m)
    p_pad = pad_to(p, blocks * m).reshape(blocks, m, L)
    suffix = hillis_scan(F.add, p_pad, reverse=True)
    h = suffix[1:].reshape((blocks - 1) * m, L)
    rem = F.add(p_pad[0], suffix[1])
    return h, rem


def segment_sum_mod(values: jnp.ndarray, seg_ids: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Modular segment sum of [N, L] Montgomery field elements by [N] ids.

    Uses plain integer jax.ops.segment_sum on an 8-bit limb split (no
    overflow for N < 2^24), then folds the redundant byte-weight columns back
    into reduced Montgomery form with two REDC multiplies:

        V = V_lo + 2^256 V_hi            (V is already Montgomery-form)
        V mod r = F.mul(V_lo, C1) + F.mul(V_hi, C2)
        C1 = R mod r,  C2 = R^2 mod r    (R = 2^256)

    (F.mul(a, b) = a*b*R^-1 fully reduced, valid for any a, b < R; summing
    Montgomery residues keeps the Montgomery factor, so only a reduction —
    not a form change — is needed.)
    """
    n = values.shape[0]
    assert n < (1 << 24)
    # byte-weight columns: c_j (weight 2^(8j)) = segment_sum of byte j
    lo = values & jnp.uint32(0xFF)
    hi = (values >> jnp.uint32(8)) & jnp.uint32(0xFF)
    interleaved = jnp.stack([lo, hi], axis=-1).reshape(n, 2 * L)
    sums = jax.ops.segment_sum(interleaved, seg_ids,
                               num_segments=num_segments)  # [S, 2L] < 2^32
    # expand each c_j into its 4 bytes at weights 8j..8j+24 -> byte grid
    width8 = 2 * L + 4
    grid = jnp.zeros((num_segments, width8), jnp.uint32)
    for shift in range(4):
        part = (sums >> jnp.uint32(8 * shift)) & jnp.uint32(0xFF)
        grid = grid + jnp.pad(part, ((0, 0), (shift, 4 - shift)))
    # pack byte pairs into 16-bit limbs and carry-normalize
    width16 = width8 // 2
    w16 = grid[:, 0::2] + (grid[:, 1::2] << jnp.uint32(8))  # each < 2^19
    out = []
    carry = jnp.zeros((num_segments,), jnp.uint32)
    for i in range(width16):
        v = w16[:, i] + carry
        out.append(v & jnp.uint32(0xFFFF))
        carry = v >> 16
    out.append(carry)
    wide = jnp.stack(out, axis=-1)  # [S, L+3], standard form, < 2^(16L+48)
    v_lo = wide[:, :L]
    v_hi = jnp.pad(wide[:, L:], ((0, 0), (0, 2 * L - width16 - 1)))
    c1 = jnp.asarray(
        np.array([(F.ctx.R_mod >> (16 * i)) & 0xFFFF for i in range(L)],
                 np.uint32)
    )
    c2 = jnp.asarray(
        np.array([(F.ctx.R2_mod >> (16 * i)) & 0xFFFF for i in range(L)],
                 np.uint32)
    )
    return F.add(F.mul(v_lo, c1[None, :]), F.mul(v_hi, c2[None, :]))
