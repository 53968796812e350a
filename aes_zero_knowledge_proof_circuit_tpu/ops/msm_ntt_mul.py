"""MXU-native Fq Montgomery multiplication via small-prime NTTs.

The f32-digit engine's schoolbook convolution (pallas_field.mul_digits) is
VMEM-bandwidth-bound: the 50-step pad ladder moves ~80 KB of VMEM traffic
per element, measured 78 ns/element on v5e — and the MSM scan kernel
(msm_pallas) sits exactly at that roofline, which is why the "TPU-native"
prover's commits ran on the host CPU through round 3 (VERDICT weak #3).

This module moves the digit convolution onto the MXU (where the FLOPs
are): a 377-bit product is an acyclic convolution of 8-bit digit vectors
(conv length 99 < 128), evaluated with length-128 NTTs over TWO small
primes and reconstructed by CRT:

    p1 = 12289, p2 = 7681        (both ≡ 1 mod 128 → 128th roots exist)
    t mod p   = W_p @ ((V_p @ a) ∘ (V_p @ b))       -- two s8 matmuls/side
    t         = CRT(t mod p1, t mod p2)             (t < 51·319² ≪ p1·p2)

Every matmul runs on the int8 MXU with exact int32 accumulation: matrices
and data are split into 7-bit planes (x = 128·hi + lo, both planes fit
int8; accumulation ≤ 2.1e8 < 2^31). Montgomery REDC reuses the pipeline
with the transforms of the CONSTANTS N' and N precomputed, so a full
mul = 16 forward-plane matmuls + 24 interpolation-plane matmuls of shape
[128, 64] @ [64, P] — ~330k int8 MACs per element, under one MXU cycle —
plus VPU int32 glue (carry rounds, mod-p reductions, CRT).

Layout is TRANSPOSED relative to the f32 engine: [digit, P] with the
batch on the 128-lane axis (full lane utilization; the f32 engine's
[N, D] layout wastes 78/128 lanes). Values are int32 digit columns in
the same redundant band discipline as field_f32 (digits normalized to
< 320 before each mul — the 7-bit data planes accept hi ≤ 4; values
folded below ~6N). Montgomery radix matches field_f32 (R = 2^400), so
digit tensors interconvert with the f32 engine by cast + transpose.

Role: ark-ff Montgomery multiplication on the MSM hot path (SURVEY.md
§2b ark-ff row; §7 step 1 "this is where speed-of-light per chip is won
or lost").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field_params import Q_MOD, inv_mod

# engine geometry — shared with field_f32's Fq instance (R = 2^400)
DIGITS = 50              # 8-bit digits per operand
CONV_OUT = 2 * DIGITS    # conv coefficients 0..98; padded rows
NTT_LEN = 128
PAD_IN = 64              # operand rows padded for the MXU contraction
PAD_OUT = 104            # conv output rows (99 -> multiple of 8)
PRIMES = (12289, 7681)   # both ≡ 1 (mod 128); p1*p2 = 94_391_809
R_BITS = 8 * DIGITS
R_INT = 1 << R_BITS

# digit-band contract: mul operands must have digits in [0, DIGIT_BAND]
# (the 7-bit plane split d = 64*hi + lo requires hi <= 4 for the int32
# accumulation bound; see _fwd)
DIGIT_BAND = 319


def _primitive_root(p: int) -> int:
    fac = []
    m = p - 1
    d = 2
    while d * d <= m:
        if m % d == 0:
            fac.append(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        fac.append(m)
    for g in range(2, p):
        if all(pow(g, (p - 1) // f, p) != 1 for f in fac):
            return g
    raise ValueError("no primitive root")


def _int_digits(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, np.int64)
    for i in range(n):
        out[i] = v & 0xFF
        v >>= 8
    assert v == 0
    return out


class NttMulConsts:
    """Host-side constant pack (numpy; passed into kernels as inputs)."""

    def __init__(self):
        q = Q_MOD
        self.nprime = (-pow(q, -1, R_INT)) % R_INT
        n_dig = _int_digits(q, DIGITS)
        np_dig = _int_digits(self.nprime, DIGITS)

        self.v_planes = []   # per prime: (Vh, Vl) int8 [NTT_LEN, PAD_IN]
        self.w_planes = []   # per prime: (Wh, Wl) int8 [PAD_OUT, NTT_LEN]
        self.e_nprime = []   # per prime: [NTT_LEN, 1] int32 (transform)
        self.e_n = []        # per prime: [NTT_LEN, 1] int32
        for p in PRIMES:
            g = _primitive_root(p)
            w = pow(g, (p - 1) // NTT_LEN, p)
            v = np.zeros((NTT_LEN, PAD_IN), np.int64)
            for i in range(NTT_LEN):
                for j in range(DIGITS + 1):   # +1 row: carry overflow digit
                    v[i, j] = pow(w, i * j, p)
            winv = inv_mod(w, p)
            ninv = inv_mod(NTT_LEN, p)
            wm = np.zeros((PAD_OUT, NTT_LEN), np.int64)
            for k in range(CONV_OUT - 1):
                for i in range(NTT_LEN):
                    wm[k, i] = pow(winv, i * k, p) * ninv % p
            self.v_planes.append(
                ((v >> 7).astype(np.int8), (v & 127).astype(np.int8))
            )
            self.w_planes.append(
                ((wm >> 7).astype(np.int8), (wm & 127).astype(np.int8))
            )

            def transform(digits: np.ndarray) -> np.ndarray:
                e = np.zeros(NTT_LEN, np.int64)
                for i in range(NTT_LEN):
                    acc = 0
                    for j, d in enumerate(digits):
                        acc += int(d) * pow(w, i * j, p)
                    e[i] = acc % p
                return e.reshape(NTT_LEN, 1).astype(np.int32)

            self.e_nprime.append(transform(np_dig))
            self.e_n.append(transform(n_dig))

        # CRT: t = t1 + p1 * ((t2 - t1) * inv(p1) mod p2)
        self.crt_c = inv_mod(PRIMES[0] % PRIMES[1], PRIMES[1])

        # band constants (int32 digit columns [DIGITS, 1])
        self.n_dig = n_dig.reshape(DIGITS, 1).astype(np.int32)
        self.two_n = _int_digits(2 * q, DIGITS).reshape(DIGITS, 1).astype(
            np.int32)
        self.c16n = _int_digits(16 * q, DIGITS).reshape(DIGITS, 1).astype(
            np.int32)
        self.inv_2n_scaled = float((2.0 ** (8 * (DIGITS - 4))) / float(2 * q))
        # carry-out weights: top three digits of the REDC low half
        wgt = np.zeros((DIGITS, 1), np.float32)
        for j in range(DIGITS - 3, DIGITS):
            wgt[j, 0] = float(2.0 ** (8 * (j - DIGITS)))
        self.carry_w = wgt

    def as_arrays(self):
        """Flat tuple of jnp arrays for kernel plumbing (stable order)."""
        out = []
        for i in range(2):
            out += [jnp.asarray(self.v_planes[i][0]),
                    jnp.asarray(self.v_planes[i][1]),
                    jnp.asarray(self.w_planes[i][0]),
                    jnp.asarray(self.w_planes[i][1]),
                    jnp.asarray(self.e_nprime[i]),
                    jnp.asarray(self.e_n[i])]
        out += [jnp.asarray(self.n_dig), jnp.asarray(self.two_n),
                jnp.asarray(self.c16n), jnp.asarray(self.carry_w)]
        return tuple(out)


@functools.lru_cache(maxsize=None)
def consts() -> NttMulConsts:
    return NttMulConsts()


# ---------------------------------------------------------------------------
# traceable math on [rows, P] int32 values (usable inside Pallas kernels)
# ---------------------------------------------------------------------------


def _s8dot(m, x):
    """[r, k] int8 @ [k, P] int8 -> [r, P] int32 on the MXU."""
    return jax.lax.dot_general(
        m, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _mod_p(x, p: int):
    """x mod p for 0 <= x < ~2.2e8 (quotient via f32 reciprocal; the f32
    rounding of x and of the product keeps |q_err| <= 2 -> two correction
    rounds each side)."""
    q = (x.astype(jnp.float32) * (1.0 / p)).astype(jnp.int32)
    r = x - q * p
    r = jnp.where(r < 0, r + p, r)
    r = jnp.where(r < 0, r + p, r)
    r = jnp.where(r >= p, r - p, r)
    r = jnp.where(r >= p, r - p, r)
    return r


def _split7(x):
    """x in [0, 2^14) -> (hi, lo) int8 planes with x = 128*hi + lo."""
    hi = jax.lax.shift_right_logical(x, 7)
    lo = jnp.bitwise_and(x, 127)
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _split6(x):
    """digit in (-2, 336) -> (hi, lo) int8 planes with x = 64*hi + lo.

    Arithmetic shift + mask is an exact decomposition for negatives too
    (-1 -> hi=-1, lo=63), so the fold band's slightly-negative digits
    need no special casing."""
    hi = jax.lax.shift_right_arithmetic(x, 6)
    lo = jnp.bitwise_and(x, 63)
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _fwd(vh, vl, ah, al, p: int):
    """Length-128 NTT mod p of digit planes (7-bit V planes, 6-bit data
    planes): E = (128 Vh + Vl) @ (64 Ah + Al) mod p. Max accumulation
    8192*51*96*4 + ... ~ 2.1e8 < 2^31."""
    e = (8192 * _s8dot(vh, ah) + 128 * _s8dot(vh, al)
         + 64 * _s8dot(vl, ah) + _s8dot(vl, al))
    return _mod_p(e, p)


def _interp(wh, wl, e, p: int):
    """Inverse transform: T = (128 Wh + Wl) @ e mod p with e in [0, p).
    Partial matmuls stay < 1.2e6; they are reduced mod p BEFORE the
    16384x recombination (which would overflow int32 otherwise)."""
    eh, el = _split7(e)
    x1 = _mod_p(_s8dot(wh, eh), p)
    x2 = _mod_p(_s8dot(wh, el) + _s8dot(wl, eh), p)
    x3 = _mod_p(_s8dot(wl, el), p)
    return _mod_p(16384 * x1 + 128 * x2 + x3, p)


def _carry2(x, rows_out: int):
    """Two floor-carry rounds along the digit axis (axis 0): coefficients
    <= 5.2e6 -> digits in [0, 319] (round 1 leaves carry <= ~20k, round 2
    carry <= ~80 -> digit <= 255 + 80). Output truncated/padded to
    rows_out rows."""
    for _ in range(2):
        carry = jax.lax.shift_right_logical(x, 8)
        digit = jnp.bitwise_and(x, 255)
        x = digit + jnp.concatenate(
            [jnp.zeros_like(carry[:1]), carry[:-1]], axis=0)
    if x.shape[0] < rows_out:
        x = jnp.concatenate(
            [x, jnp.zeros((rows_out - x.shape[0],) + x.shape[1:], x.dtype)],
            axis=0)
    return x[:rows_out]


def _conv_modp(a_dig, b_planes, cs, prime_idx: int):
    """One prime channel of conv(a, b): b may be pre-transformed
    (b_planes = eval row [NTT_LEN, P] int32) or digit planes."""
    p = PRIMES[prime_idx]
    vh, vl = cs[6 * prime_idx], cs[6 * prime_idx + 1]
    ah, al = _split6(a_dig)
    ea = _fwd(vh, vl, ah, al, p)
    eb = b_planes[prime_idx]
    prod = _mod_p(ea * eb, p)
    wh, wl = cs[6 * prime_idx + 2], cs[6 * prime_idx + 3]
    return _interp(wh, wl, prod, p)


def _crt(t1, t2):
    """Exact conv coefficients from the two prime residues (< p1*p2)."""
    c = consts().crt_c
    p1, p2 = PRIMES
    d = _mod_p(t2 - t1 + p2 * 2, p2)
    e = _mod_p(d * c, p2)
    return t1 + p1 * e


def fwd_planes(x_dig, cs):
    """Both prime-channel transforms of a digit tensor [PAD_IN, P] with
    digits in [0, DIGIT_BAND] — the cacheable half of a product."""
    out = []
    for i, p in enumerate(PRIMES):
        vh, vl = cs[6 * i], cs[6 * i + 1]
        xh, xl = _split6(x_dig)
        out.append(_fwd(vh, vl, xh, xl, p))
    return tuple(out)


def _conv(a_dig, eb_planes, cs):
    """Exact digit convolution a * b via NTT-CRT; a as digits, b as its
    two eval rows. Returns [PAD_OUT, P] coefficients (< 5.2e6)."""
    t1 = _conv_modp(a_dig, eb_planes, cs, 0)
    t2 = _conv_modp(a_dig, eb_planes, cs, 1)
    return _crt(t1, t2)


def mul_T(a, b, cs):
    """Montgomery product on [PAD_IN, P] int32 digit columns (digits in
    [0, DIGIT_BAND], value < ~4.2 N). Returns same form, value < 1.1 N.

    REDC: t = a*b;  m = (t mod R) * N' mod R;  out = (t + m*N) / R.
    The two constant products reuse precomputed transforms E[N'], E[N].
    """
    eb = fwd_planes(b, cs)
    t = _conv(a, eb, cs)                      # [PAD_OUT, P] coeffs of a*b
    t_dig = _carry2(t, PAD_OUT)               # digits [0, 319]

    t_lo = jnp.concatenate(
        [t_dig[:DIGITS],
         jnp.zeros((PAD_IN - DIGITS,) + t.shape[1:], t.dtype)], axis=0)
    e_np = (cs[4], cs[10])                    # E[N'] per prime
    m = _crt(_conv_modp(t_lo, e_np, cs, 0),
             _conv_modp(t_lo, e_np, cs, 1))
    m_dig = _carry2(m, PAD_IN)                # digits of m (mod R: low 50)
    m_dig = jnp.concatenate(
        [m_dig[:DIGITS],
         jnp.zeros((PAD_IN - DIGITS,) + m.shape[1:], m.dtype)], axis=0)

    e_n = (cs[5], cs[11])                     # E[N] per prime
    mn = _crt(_conv_modp(m_dig, e_n, cs, 0),
              _conv_modp(m_dig, e_n, cs, 1))

    v = _carry2(t_dig + _carry2(mn, PAD_OUT), PAD_OUT)
    # carry out of the low half: low 50 digits of the VALUE are 0 mod R;
    # recover the integer carry from the top three low-half digits (the
    # rest contribute < 2^-14) — same proven trick as field_f32.mul.
    carry_w = cs[15]
    carry = jnp.round(
        jnp.sum(v[:DIGITS].astype(jnp.float32) * carry_w, axis=0,
                keepdims=True)).astype(jnp.int32)
    hi = v[DIGITS:]
    hi = jnp.concatenate([hi[:1] + carry, hi[1:]], axis=0)
    out = jnp.concatenate(
        [hi, jnp.zeros((PAD_IN - hi.shape[0],) + hi.shape[1:], hi.dtype)],
        axis=0)
    return _carry2(out, PAD_IN)


def fold_T(x, cs):
    """Value fold below ~6N (digits may be negative or > band): subtract
    m*2N with m from the float top-digit estimate, then two carry rounds
    handling negatives (arithmetic shift = floor division)."""
    inv2n = consts().inv_2n_scaled
    est = (x[DIGITS - 1].astype(jnp.float32) * 16777216.0
           + x[DIGITS - 2].astype(jnp.float32) * 65536.0
           + x[DIGITS - 3].astype(jnp.float32) * 256.0
           + x[DIGITS - 4].astype(jnp.float32)) * inv2n
    m = jnp.maximum(jnp.floor(est) - 1.0, 0.0).astype(jnp.int32)
    two_n = cs[13]
    x = jnp.concatenate(
        [x[:DIGITS] - m[None, :] * two_n, x[DIGITS:]], axis=0)
    for _ in range(2):
        carry = jax.lax.shift_right_arithmetic(x, 8)   # floor for negatives
        digit = x - carry * 256
        x = digit + jnp.concatenate(
            [jnp.zeros_like(carry[:1]), carry[:-1]], axis=0)
    return x


def add_T(a, b, cs):
    return fold_T(a + b, cs)


def sub_T(a, b, cs):
    return fold_T(a - b + jnp.concatenate(
        [cs[14], jnp.zeros((PAD_IN - DIGITS, 1), jnp.int32)], axis=0), cs)


# ---------------------------------------------------------------------------
# host conversion + standalone pallas wrapper (testing / microbench)
# ---------------------------------------------------------------------------


def ints_to_cols(values, mont: bool = True) -> np.ndarray:
    """list[int] -> [PAD_IN, N] int32 digit columns (Montgomery form)."""
    n = len(values)
    out = np.zeros((PAD_IN, n), np.int32)
    for i, v in enumerate(values):
        v = int(v) % Q_MOD
        if mont:
            v = v * R_INT % Q_MOD
        for j in range(DIGITS):
            out[j, i] = v & 0xFF
            v >>= 8
    return out


def cols_to_ints(arr: np.ndarray, mont: bool = True):
    """[PAD_IN, N] int32 digit columns -> canonical ints."""
    arr = np.asarray(arr, np.int64)
    out = []
    rinv = inv_mod(R_INT % Q_MOD, Q_MOD)
    for i in range(arr.shape[1]):
        v = 0
        for j in range(arr.shape[0] - 1, -1, -1):
            v = (v << 8) + int(arr[j, i])
        v %= Q_MOD
        if mont:
            v = v * rinv % Q_MOD
        out.append(v)
    return out


@functools.lru_cache(maxsize=None)
def _mul_call(n_cols: int, blk: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cs_shapes = [a.shape for a in consts().as_arrays()]

    def kern(*refs):
        a_ref, b_ref = refs[0], refs[1]
        cs = tuple(r[:] for r in refs[2:-1])
        out_ref = refs[-1]
        out_ref[:] = mul_T(a_ref[:], b_ref[:], cs)

    col = pl.BlockSpec((PAD_IN, blk), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in cs_shapes
    ]
    return pl.pallas_call(
        kern,
        grid=(n_cols // blk,),
        in_specs=[col, col] + const_specs,
        out_specs=col,
        out_shape=jax.ShapeDtypeStruct((PAD_IN, n_cols), jnp.int32),
        interpret=interpret,
    )


def ntt_mul(a_cols: jnp.ndarray, b_cols: jnp.ndarray, blk: int = 256,
            interpret: bool | None = None) -> jnp.ndarray:
    """Standalone Montgomery mul over [PAD_IN, N] digit columns."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = a_cols.shape[1]
    pad = (-n) % blk
    if pad:
        zp = lambda x: jnp.concatenate(
            [x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1)
        a_cols, b_cols = zp(a_cols), zp(b_cols)
    call = _mul_call(n + pad, blk, interpret)
    out = call(a_cols, b_cols, *consts().as_arrays())
    return out[:, :n] if pad else out
