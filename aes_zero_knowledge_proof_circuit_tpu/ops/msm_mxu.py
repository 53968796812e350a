"""Pippenger MSM on the int8 MXU: plain-form field math, signed windows.

Second-generation device MSM (the TPU-native answer to ark-ec's
VariableBaseMSM at the KZG commit sites — SURVEY.md §2b ark-ec row, §7
step 5).  It keeps the round-4 bucket-scan STRUCTURE from
ops/msm_pallas.py (argsort -> column-major landing -> sequential-grid
Pallas segmented scan -> tail scatter -> fold) and changes the two things
that kept that kernel at 0.04 Mpoints/s:

 1. **Field engine**: every Fq multiply runs through ops/mxu_field.py —
    ONE NTT-CRT convolution on the int8 MXU plus one reduction matmul —
    instead of the VMEM-bound f32 schoolbook ladder (78 ns/elt) or the
    Montgomery NTT pipeline (66 ns/elt).  The layout is transposed to
    [digit, point] so the 128-lane axis carries points at full
    utilization, and the adds cache NTT forward transforms across the
    multiplies that share operands (12 transforms + 11 pointwise
    products per mixed add instead of 22 + 11).

 2. **Signed 13-bit windows**: scalars decompose into 20 digits in
    [-4096, 4096] instead of 32 unsigned 8-bit windows — 1.6x fewer
    point-additions for one extra select (conditional y-negation) per
    scan step.

Completeness contract (stronger than msm_pallas, and the reason the
merge/fold phases are cheap): EVERY addition in this MSM — scan, tail
merge, suffix fold — uses an INCOMPLETE add (no doubling / P==-Q branch;
infinity handled by flags/z==0).  Each intermediate operand is a
small-integer combination  sum_i c_i * P_i  of the distinct input points
with 0 < c_i <= 4096; two such combinations colliding (equal or negated)
is a nontrivial polynomial identity in the SRS secret tau of degree
< |SRS| with coefficients << r, i.e. probability ~ deg/r < 2^-230 over
the (honestly sampled) SRS.  This is the same argument msm_pallas.py
makes for its scan phase, extended to the whole pipeline; it holds for
any point set with no known nontrivial linear relations (SRS powers,
random test points), which is every call site in this prover.  It does
NOT hold for adversarially related points — this is the prover's own
commit path, where a (negligible-probability) miss yields an invalid
proof, never an unsound one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve_host import AffinePoint, g1_infinity, g1_point
from .field_params import Q_MOD, inv_mod
from . import mxu_field as mf
from .mxu_field import PAD_IN

# window size is a tunable: c=13 (20 windows, 4096 signed buckets) is
# the TPU default; CPU tests use c=8 so the merge/fold table graphs stay
# small enough for XLA:CPU to compile quickly.
WINDOW_BITS = 13
LANES = 128
SCAN_CHUNK = 4
SCALAR_BITS = 253
# segment size for large MSMs (see msm_mxu).  2^20 keeps every 16B-proof
# MSM in one scan call (per-segment prep/merge overhead is ~1.5s) while
# bounding the 64B config's 2^21/2^22 MSMs to one compiled scan shape
# and ~0.8 GB of gather transients per segment.
MAX_SEGMENT_LOG = 20


def _n_windows(c: int) -> int:
    return -(-SCALAR_BITS // c)


def _buckets(c: int) -> int:
    return 1 << (c - 1)


# ---------------------------------------------------------------------------
# point containers ([PAD_IN, P] int32 digit columns, digit axis FIRST)
# ---------------------------------------------------------------------------


class PlainPoints:
    """Affine G1 points as plain digit columns on device: x, y [64, N]
    **uint8** (canonical digits; 4x less HBM than int32 — the 2^22 SRS
    is 0.54 GB instead of 2.1, which is what lets the 64-byte prover fit
    beside it).

    Built from the SRS checkpoint's packed [N, 2, 24] uint32 16-bit limb
    array with two cheap bit ops — no host bigint work and no Montgomery
    conversion (plain form IS the checkpoint form)."""

    def __init__(self, x_dig: jnp.ndarray, y_dig: jnp.ndarray):
        self.x = x_dig
        self.y = y_dig
        self.n = x_dig.shape[1]

    @classmethod
    def from_packed(cls, packed: np.ndarray) -> "PlainPoints":
        cols = []
        for c in range(2):
            limbs = jnp.asarray(packed[:, c, :].astype(np.int32))  # [N, 24]
            lo = limbs & 0xFF
            hi = limbs >> 8
            dig = jnp.stack([lo, hi], axis=-1).reshape(-1, 48)     # [N, 48]
            dig = jnp.pad(dig, ((0, 0), (0, PAD_IN - 48)))
            cols.append(dig.T.astype(jnp.uint8))                   # [64, N]
        return cls(cols[0], cols[1])

    @classmethod
    def from_affine(cls, points) -> "PlainPoints":
        xs = [0 if p.inf else int(p.x) for p in points]
        ys = [0 if p.inf else int(p.y) for p in points]
        return cls(jnp.asarray(mf.ints_to_cols(xs)).astype(jnp.uint8),
                   jnp.asarray(mf.ints_to_cols(ys)).astype(jnp.uint8))

    def slice(self, start: int, length: int) -> "PlainPoints":
        assert start + length <= self.n, (
            f"point slice [{start}:{start + length}] exceeds {self.n}")
        return PlainPoints(self.x[:, start:start + length],
                           self.y[:, start:start + length])


# ---------------------------------------------------------------------------
# incomplete point arithmetic (digit axis first, any batch shape after)
# ---------------------------------------------------------------------------


def _inf_mask(z):
    """[64, *B] -> [1, *B] bool: column is the point at infinity (z==0)."""
    return jnp.all(z == 0, axis=0, keepdims=True)


def _scale4(e):
    """x4 on a transform pair (linearity of the NTT)."""
    return tuple(mf.eval_scale(e[i], 4, p) for i, p in enumerate(mf.PRIMES))


def _esum(ea, eb):
    """Transform of a sum (linearity), re-reduced below p."""
    return tuple(mf._mod_p(ea[i] + eb[i], p)
                 for i, p in enumerate(mf.PRIMES))


def madd_in(cs, ax, ay, az, qx, qy, q_inf):
    """Incomplete mixed add acc(Jacobian) + q(affine, infinity-by-flag).

    madd-2007-bl: Z1Z1=Z1^2; U2=X2*Z1Z1; S2=Y2*Z1*Z1Z1; H=U2-X1; HH=H^2;
    I=4HH; J=H*I; r=2(S2-Y1); V=X1*I; X3=r^2-J-2V; Y3=r(V-X3)-2*Y1*J;
    Z3=(Z1+H)^2-Z1Z1-HH.  Forward transforms are cached across shared
    operands; the 4x scalings and the (Z1+H) sum ride NTT linearity.
    Assumes acc != +-q as group elements (module contract)."""
    T, I = mf.tr, mf.mul_ee
    e_az = T(az, cs)
    z1z1 = I(e_az, e_az, cs)
    e_z = T(z1z1, cs)
    u2 = I(T(qx, cs), e_z, cs)
    s1 = I(T(qy, cs), e_az, cs)
    s2 = I(T(s1, cs), e_z, cs)
    h = mf.sub_pp(u2, ax, cs, big=True)          # ax: prior x3, < ~2^396
    e_h = T(h, cs)
    hh = I(e_h, e_h, cs)
    e_hh = T(hh, cs)
    j = I(_scale4(e_h), e_hh, cs)                # J = H * 4HH
    v = I(_scale4(T(ax, cs)), e_hh, cs)          # V = X1 * 4HH
    rr = mf.sub_pp(s2, ay, cs, big=True)         # ay: prior y3, < ~2^395
    r = mf.add_pp(rr, rr)
    e_r = T(r, cs)
    r2 = I(e_r, e_r, cs)
    x3 = mf.sub_pp(mf.sub_pp(r2, j, cs), mf.add_pp(v, v), cs)
    vmx = mf.sub_pp(v, x3, cs, big=True)
    t1 = I(e_r, T(vmx, cs), cs)
    ayj = I(T(ay, cs), T(j, cs), cs)
    y3 = mf.sub_pp(t1, mf.add_pp(ayj, ayj), cs)
    sq = I(_esum(e_az, e_h), _esum(e_az, e_h), cs)
    z3 = mf.sub_pp(mf.sub_pp(sq, z1z1, cs), hh, cs)

    a_inf = _inf_mask(az)
    one = jnp.zeros_like(az) + cs[12].reshape((-1,) + (1,) * (az.ndim - 1))
    ox = jnp.where(a_inf, qx, jnp.where(q_inf, ax, x3))
    oy = jnp.where(a_inf, qy, jnp.where(q_inf, ay, y3))
    oz = jnp.where(a_inf, jnp.where(q_inf, az, one),
                   jnp.where(q_inf, az, z3))
    return ox, oy, oz


def jac_double_in(cs, p):
    """Jacobian doubling on the a=0 curve (dbl-2009-l):
    A=X^2; B=Y^2; C=B^2; D=2((X+B)^2-A-C); E=3A; F=E^2;
    X3=F-2D; Y3=E(D-X3)-8C; Z3=2YZ.  Infinity (z==0) passes through
    (all outputs scale by z-powers and stay 0)."""
    T, I = mf.tr, mf.mul_ee
    px, py, pz = p
    e_x = T(px, cs)
    a = I(e_x, e_x, cs)
    e_y = T(py, cs)
    b = I(e_y, e_y, cs)
    e_b = T(b, cs)
    c = I(e_b, e_b, cs)
    xb = mf.add_pp(px, b)
    e_xb = T(xb, cs)
    sq = I(e_xb, e_xb, cs)
    d0 = mf.sub_pp(mf.sub_pp(sq, a, cs, big=True), c, cs)
    # fold D's value (~2^397) back under 6N so the X3/Y3 subtraction
    # offsets keep headroom below the 2^400 representation cap
    d = mf.fold_val(mf.add_pp(d0, d0), cs)
    e3 = mf.add_pp(mf.add_pp(a, a), a)
    e_e = T(e3, cs)
    f = I(e_e, e_e, cs)
    x3 = mf.sub_pp(f, mf.add_pp(d, d), cs, big=True)
    dmx = mf.sub_pp(d, x3, cs, big=True)
    t1 = I(e_e, T(dmx, cs), cs)
    c8 = mf.add_pp(mf.add_pp(c, c), mf.add_pp(c, c))
    c8 = mf.add_pp(c8, c8)
    y3 = mf.sub_pp(t1, c8, cs, big=True)
    yz = I(e_y, T(pz, cs), cs)
    z3 = mf.add_pp(yz, yz)
    return x3, y3, z3


def jac_add_in(cs, p, q):
    """Incomplete Jacobian + Jacobian (add-2007-bl), infinity via z==0,
    with a DIGIT-EQUALITY doubling guard: in the suffix-fold phases,
    equal operands legitimately occur when a run of buckets is empty —
    and when they do, they are digit-identical tensors (the same values
    copied through the scan), so a cheap representation-equality test
    catches exactly those cases without any canonicalization.  Group-
    equal but digit-different operands remain excluded by the module's
    subset-sum contract.  p, q: triples of [64, *B]."""
    T, I = mf.tr, mf.mul_ee
    px, py, pz = p
    qx, qy, qz = q
    e_pz = T(pz, cs)
    e_qz = T(qz, cs)
    z1z1 = I(e_pz, e_pz, cs)
    z2z2 = I(e_qz, e_qz, cs)
    e_z1z1 = T(z1z1, cs)
    e_z2z2 = T(z2z2, cs)
    u1 = I(T(px, cs), e_z2z2, cs)
    u2 = I(T(qx, cs), e_z1z1, cs)
    s1a = I(T(py, cs), e_qz, cs)
    s1 = I(T(s1a, cs), e_z2z2, cs)
    s2a = I(T(qy, cs), e_pz, cs)
    s2 = I(T(s2a, cs), e_z1z1, cs)
    h = mf.sub_pp(u2, u1, cs)
    e_h = T(h, cs)
    hh = I(e_h, e_h, cs)
    e_hh = T(hh, cs)
    j = I(_scale4(e_h), e_hh, cs)                # J = H * (2H)^2
    v = I(_scale4(T(u1, cs)), e_hh, cs)          # V = U1 * (2H)^2
    rr = mf.sub_pp(s2, s1, cs)
    r = mf.add_pp(rr, rr)
    e_r = T(r, cs)
    r2 = I(e_r, e_r, cs)
    x3 = mf.sub_pp(mf.sub_pp(r2, j, cs), mf.add_pp(v, v), cs)
    vmx = mf.sub_pp(v, x3, cs, big=True)
    t1 = I(e_r, T(vmx, cs), cs)
    s1j = I(T(s1, cs), T(j, cs), cs)
    y3 = mf.sub_pp(t1, mf.add_pp(s1j, s1j), cs)
    sq = I(_esum(e_pz, e_qz), _esum(e_pz, e_qz), cs)
    w = mf.sub_pp(mf.sub_pp(sq, z1z1, cs), z2z2, cs)
    z3 = I(T(w, cs), e_h, cs)

    dblx, dbly, dblz = jac_double_in(cs, p)
    same = jnp.all(
        jnp.logical_and(px == qx, jnp.logical_and(py == qy, pz == qz)),
        axis=0, keepdims=True)
    x3 = jnp.where(same, dblx, x3)
    y3 = jnp.where(same, dbly, y3)
    z3 = jnp.where(same, dblz, z3)

    p_inf = _inf_mask(pz)
    q_inf = _inf_mask(qz)
    ox = jnp.where(p_inf, qx, jnp.where(q_inf, px, x3))
    oy = jnp.where(p_inf, qy, jnp.where(q_inf, py, y3))
    oz = jnp.where(p_inf, qz, jnp.where(q_inf, pz, z3))
    return ox, oy, oz


# ---------------------------------------------------------------------------
# signed digit decomposition
# ---------------------------------------------------------------------------


def signed_digits(limbs16: jnp.ndarray, c: int = WINDOW_BITS):
    """[n, 16] uint32 16-bit limbs of standard scalars (< r < 2^253) ->
    (buckets [W, n] int32 in [0, 2^(c-1)], neg [W, n] bool): signed
    base-2^c digits d_i in [-2^(c-1), 2^(c-1)], s = sum d_i 2^(c i)."""
    limbs = limbs16.astype(jnp.uint32)
    half, full = 1 << (c - 1), 1 << c
    raw = []
    for i in range(_n_windows(c)):
        bit = c * i
        j, off = bit // 16, bit % 16
        w = limbs[:, j] >> off
        if off + c > 16 and j + 1 < 16:
            w = w | (limbs[:, j + 1] << (16 - off))
        raw.append(w & (full - 1))
    buckets, negs = [], []
    carry = jnp.zeros_like(raw[0])
    for i in range(_n_windows(c)):
        t = raw[i] + carry
        neg = t >= half                    # shift to [-half, 0)
        d = jnp.where(neg, full - t, t)    # magnitude
        carry = neg.astype(jnp.uint32)
        buckets.append(d.astype(jnp.int32))
        negs.append(jnp.logical_and(neg, d != 0))
    # top digit never re-signs (scalars < 2^253 leave headroom): with
    # c | 16 the final window is partial; carry dies in the top digit
    return jnp.stack(buckets), jnp.stack(negs)


# ---------------------------------------------------------------------------
# Pallas segmented-scan kernel
# ---------------------------------------------------------------------------

N_CONSTS = len(mf.const_arrays())


def _scan_kernel(qx_ref, qy_ref, fl_ref, *rest, chunk: int):
    cs = tuple(r[:] for r in rest[:N_CONSTS])
    ox_ref, oy_ref, oz_ref, accx, accy, accz = rest[N_CONSTS:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        accx[:] = jnp.zeros_like(accx)
        accy[:] = jnp.zeros_like(accy)
        accz[:] = jnp.zeros_like(accz)

    def body(c, acc):
        ax, ay, az = acc
        s = (pl.ds(c, 1), slice(None), slice(None))
        qx = qx_ref[s][0].astype(jnp.int32)     # points stream as uint8
        qy = qy_ref[s][0].astype(jnp.int32)
        fl = fl_ref[s][0]                       # [8, LANES] int32
        seg = fl[0:1] != 0                      # new-segment flag
        neg = fl[1:2] != 0                      # negate q
        valid = fl[2:3] != 0                    # q present (not padding)
        # conditional negation: -y = (2^18*N - y) carried back to band
        ny = mf.carry2(cs[10] - qy, PAD_IN)
        qy = jnp.where(neg, ny, qy)
        q_inf = jnp.logical_not(valid)
        sx, sy, sz = madd_in(cs, ax, ay, az, qx, qy, q_inf)
        # segment start: acc := q (or infinity when q is padding)
        one = jnp.zeros_like(az) + cs[12].reshape((-1, 1))
        vz = jnp.where(valid, one, jnp.zeros_like(az))
        ax = jnp.where(seg, jnp.where(valid, qx, jnp.zeros_like(ax)), sx)
        ay = jnp.where(seg, jnp.where(valid, qy, jnp.zeros_like(ay)), sy)
        az = jnp.where(seg, vz, sz)
        # streams narrow to int16: band digits stay in (-2, ~900)
        ox_ref[s] = ax.astype(jnp.int16)[None]
        oy_ref[s] = ay.astype(jnp.int16)[None]
        oz_ref[s] = az.astype(jnp.int16)[None]
        return ax, ay, az

    acc0 = (accx[:], accy[:], accz[:])
    ax, ay, az = jax.lax.fori_loop(0, chunk, body, acc0)
    accx[:] = ax
    accy[:] = ay
    accz[:] = az


@functools.lru_cache(maxsize=None)
def _scan_call(steps: int, interpret: bool, chunk: int = SCAN_CHUNK):
    chunk = chunk if steps % chunk == 0 else 1
    cs_shapes = [a.shape for a in mf.const_arrays()]
    row = pl.BlockSpec((chunk, PAD_IN, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    flg = pl.BlockSpec((chunk, 8, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in cs_shapes
    ]
    shp = jax.ShapeDtypeStruct((steps, PAD_IN, LANES), jnp.int16)
    call = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=chunk),
        grid=(steps // chunk,),
        in_specs=[row, row, flg] + const_specs,
        out_specs=[row, row, row],
        out_shape=[shp, shp, shp],
        scratch_shapes=[pltpu.VMEM((PAD_IN, LANES), jnp.int32)] * 3,
        interpret=interpret,
    )

    def run(qx, qy, flags):
        return call(qx, qy, flags, *mf.const_arrays())

    return run


# ---------------------------------------------------------------------------
# per-window program: sort -> scan -> compact tails -> segmented merge
# ---------------------------------------------------------------------------


def _seg_pass(cs, x, y, z, f, d: int):
    """One segmented-hillis pass (distance d) on [64, T] triples.
    Fixed [64, TAIL_CAP] shapes: compiled once per distance and reused
    across every window and every MSM size."""
    px = jnp.pad(x, [(0, 0), (d, 0)])[:, :-d]
    py = jnp.pad(y, [(0, 0), (d, 0)])[:, :-d]
    pz = jnp.pad(z, [(0, 0), (d, 0)])[:, :-d]
    pf = jnp.pad(f, (d, 0))[:-d]
    ax, ay, az = jac_add_in(cs, (x, y, z), (px, py, pz))
    keep = f[None, :]
    x = jnp.where(keep, x, ax)
    y = jnp.where(keep, y, ay)
    z = jnp.where(keep, z, az)
    return x, y, z, jnp.logical_or(f, pf)


@functools.lru_cache(maxsize=None)
def _seg_pass_jit(d: int):
    return jax.jit(functools.partial(_seg_pass, d=d))


def _prep_window(px, py, dwin, neg, valid):
    """Sort/gather/flags for one window: the only per-size XLA program
    besides the Pallas scan, and it contains only cheap data movement."""
    n = dwin.shape[0]
    steps = n // LANES
    order = jnp.argsort(dwin)
    oc = order.reshape(LANES, steps).swapaxes(0, 1)        # [steps, LANES]
    ds = dwin[oc]
    sx = jnp.moveaxis(px[:, oc], 0, 1)                     # [steps, 64, L]
    sy = jnp.moveaxis(py[:, oc], 0, 1)                     # (uint8)
    sneg = neg[oc]
    svalid = valid[oc]
    first = jnp.ones((1, LANES), bool)
    newseg = jnp.concatenate([first, ds[1:] != ds[:-1]], axis=0)
    flags = jnp.zeros((steps, 8, LANES), jnp.int32)
    flags = flags.at[:, 0, :].set(newseg.astype(jnp.int32))
    flags = flags.at[:, 1, :].set(sneg.astype(jnp.int32))
    flags = flags.at[:, 2, :].set(svalid.astype(jnp.int32))
    return sx, sy, flags, ds, newseg


@functools.lru_cache(maxsize=None)
def _prep_window_jit():
    return jax.jit(_prep_window)


def _compact_tails(ox, oy, oz, ds, newseg, c: int):
    """Extract segment tails from the scan stream, compacted and sorted
    by bucket (cheap data movement; per-size compile)."""
    buckets_c = _buckets(c)
    tail_cap = buckets_c + LANES
    last = jnp.ones((1, LANES), bool)
    is_tail = jnp.concatenate([newseg[1:], last], axis=0)
    real = jnp.logical_and(is_tail, ds > 0)                # drop dump runs
    big = jnp.int32(buckets_c + 2)
    # lane-major flatten (l*steps + s): each lane's digits ascend with s
    # and lane l's run precedes lane l+1's in the global sort, so real
    # tails are already bucket-sorted in this order; the stable argsort
    # just compacts them to the front.
    key_lm = jnp.where(real, ds, big).swapaxes(0, 1).reshape(-1)
    idx = jnp.argsort(key_lm, stable=True)[:tail_cap]
    cbucket = key_lm[idx]

    def flat_lm(a):                                        # [steps, 64, L]
        return jnp.transpose(a, (2, 0, 1)).reshape(-1, PAD_IN)

    cx = flat_lm(ox)[idx].T.astype(jnp.int32)              # [64, tail_cap]
    cy = flat_lm(oy)[idx].T.astype(jnp.int32)
    cz = flat_lm(oz)[idx].T.astype(jnp.int32)
    pad_inf = (cbucket >= big)[None, :]
    cz = jnp.where(pad_inf, 0, cz)
    segs = jnp.concatenate(
        [jnp.ones((1,), bool), cbucket[1:] != cbucket[:-1]])
    return cx, cy, cz, cbucket, segs


@functools.lru_cache(maxsize=None)
def _compact_tails_jit(c: int):
    return jax.jit(functools.partial(_compact_tails, c=c))


def _scatter_buckets(cs, mx, my, mz, cbucket, c: int):
    """Per-bucket totals (segment tails of the merged stream) scattered
    into [64, B+1] tables (fixed shapes; compiled once per c)."""
    buckets_c = _buckets(c)
    tail = jnp.concatenate([cbucket[:-1] != cbucket[1:],
                            jnp.ones((1,), bool)])
    slot = jnp.where(jnp.logical_and(tail, cbucket <= buckets_c),
                     cbucket, buckets_c + 1)

    def scat(a):                                           # [64, tail_cap]
        tbl = jnp.zeros((buckets_c + 2, PAD_IN), jnp.int32)
        return tbl.at[slot].set(a.T)[: buckets_c + 1].T    # [64, B+1]

    return scat(mx), scat(my), scat(mz)


@functools.lru_cache(maxsize=None)
def _scatter_buckets_jit(c: int):
    return jax.jit(functools.partial(_scatter_buckets, c=c))


def _window_tables(cs, px, py, dwin, neg, valid, interpret: bool,
                   c: int):
    """One window's bucket totals [64, B+1] x3 (index = bucket, slot 0
    unused): prep -> Pallas scan -> compact -> segmented merge (13
    shape-fixed passes) -> scatter."""
    n = dwin.shape[0]
    steps = n // LANES
    sx, sy, flags, ds, newseg = _prep_window_jit()(px, py, dwin, neg,
                                                   valid)
    ox, oy, oz = _scan_call(steps, interpret)(sx, sy, flags)
    cx, cy, cz, cbucket, segs = _compact_tails_jit(c)(ox, oy, oz, ds,
                                                      newseg)
    t = segs.shape[0]
    x, y, z, f = cx, cy, cz, segs
    d = 1
    while d < t:
        x, y, z, f = _seg_pass_jit(d)(cs, x, y, z, f)
        d *= 2
    return _scatter_buckets_jit(c)(cs, x, y, z, cbucket)


def _window_tables_jit(interpret: bool, c: int):
    # thin factory (call-site compatibility): the stages inside
    # _window_tables are individually jitted — with fixed shapes where
    # possible — because one fat per-size XLA program measured 700s+ of
    # XLA:TPU compile on the first 2^14 MSM
    return functools.partial(_window_tables, interpret=interpret, c=c)


def _fold_tables(cs, bx, by, bz, sel):
    """[64, W, B+1] bucket tables + set-bucket indices [S] -> [64, W]:
    the tree-sum  sum_{b in sel} T_b.

    Every addition here combines partial sums over DISJOINT bucket
    subsets, so two operands can only be equal by negligible-probability
    collision or by being exact-zero infinities — never by the nested-
    suffix structure that breaks incomplete adds (two nested suffix sums
    over an empty gap are group-equal with different Jacobian
    representations; the digit-equality doubling guard cannot see that).
    That is why the bucket-weighted sum sum_b b*T_b is decomposed by
    BITS of b (msm_mxu host combine) instead of by suffix scans — and
    only the ~B/2 set buckets per bit are gathered into the tree (the
    infinity slots of a full masked tree cost the same multiplies)."""
    x, y, z = bx[..., sel], by[..., sel], bz[..., sel]
    while x.shape[-1] > 1:
        h = (x.shape[-1] + 1) // 2
        pad = 2 * h - x.shape[-1]
        if pad:
            zs = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x, y, z = (jnp.pad(a, zs) for a in (x, y, z))  # inf padding
        lo = (x[..., :h], y[..., :h], z[..., :h])
        hi = (x[..., h:2 * h], y[..., h:2 * h], z[..., h:2 * h])
        x, y, z = jac_add_in(cs, lo, hi)
    return x[..., 0], y[..., 0], z[..., 0]


@functools.lru_cache(maxsize=None)
def _fold_tables_jit():
    return jax.jit(_fold_tables)


def _merge_tables(cs, a, b):
    """Merge two segments' bucket tables ([64, B+1] x3 each): per-slot
    jac add of disjoint subset sums."""
    return jac_add_in(cs, a, b)


@functools.lru_cache(maxsize=None)
def _merge_tables_jit():
    return jax.jit(_merge_tables)


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def msm_mxu(points: PlainPoints, limbs16, interpret: bool | None = None,
            c: int | None = None) -> AffinePoint:
    """Full MSM: points (plain digit columns) x scalars ([n, 16] 16-bit
    limbs of the standard value, as to_msm_digits produces).  Returns a
    host affine point."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if c is None:
        # CPU (tests): small windows keep the merge/fold graphs at sizes
        # XLA:CPU compiles in seconds rather than minutes
        c = WINDOW_BITS if jax.default_backend() == "tpu" else 8
    cs = mf.const_arrays()
    limbs16 = jnp.asarray(limbs16)
    n = limbs16.shape[0]
    assert points.n >= n, f"{points.n} points < {n} scalars"
    px, py = points.x[:, :n], points.y[:, :n]
    # shape quantization: every distinct scan shape costs minutes of
    # cold Mosaic/XLA compile, so MSMs larger than MAX_SEGMENT run as
    # fixed-size segments whose per-window bucket tables are merged
    # (disjoint subset sums — the incomplete add stays safe); smaller
    # MSMs pad to the next power of two.  A 16B proof therefore
    # compiles exactly ONE large-scan shape.
    seg_n = 1 << MAX_SEGMENT_LOG
    quantum = LANES * SCAN_CHUNK
    if n > seg_n:
        target = -(-n // seg_n) * seg_n
    else:
        target = max(quantum, 1 << (n - 1).bit_length())
    pad = target - n
    buckets, negs = signed_digits(limbs16, c)
    valid = jnp.ones((n,), bool)
    if pad:
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, pad)))
        buckets = jnp.pad(buckets, ((0, 0), (0, pad)))
        negs = jnp.pad(negs, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, (0, pad))

    prog = _window_tables_jit(interpret, c)
    merge = _merge_tables_jit()
    multi_seg = target > seg_n
    tabs = []
    for w in range(_n_windows(c)):
        acc = None
        for s0 in range(0, target, seg_n):
            s1 = min(s0 + seg_n, target)
            t = prog(cs, px[:, s0:s1], py[:, s0:s1],
                     buckets[w, s0:s1], negs[w, s0:s1], valid[s0:s1])
            acc = t if acc is None else merge(cs, acc, t)
        tabs.append(acc)
        if multi_seg:
            # bound the async dispatch window: under the axon plugin a
            # queued program's output buffers are allocated at enqueue
            # (see prover_jax._sync), so letting all 20 windows x 4
            # segments of a 2^22 MSM queue ahead holds tens of GB of
            # scan-stream transients in HBM at once — the 64-byte
            # round-3 OOM. One tiny fetch per window keeps at most a
            # window's programs in flight.
            np.asarray(jax.device_get(acc[2].ravel()[-1:]))
    bx = jnp.stack([t[0] for t in tabs], axis=1)           # [64, W, B+1]
    by = jnp.stack([t[1] for t in tabs], axis=1)
    bz = jnp.stack([t[2] for t in tabs], axis=1)
    # weighted bucket fold, decomposed by bits of the bucket index:
    #   S_w = sum_b b * T_b = sum_j 2^j * (sum_{b: bit j of b} T_b)
    # (see _fold_tables for why suffix scans are not usable here)
    nbits = c  # bucket indices go up to 2^(c-1) inclusive
    fold = _fold_tables_jit()
    bit_sums = []
    for j in range(nbits):
        sel = np.asarray(
            [b for b in range(1, _buckets(c) + 1) if (b >> j) & 1],
            np.int32)
        bit_sums.append(fold(cs, bx, by, bz, jnp.asarray(sel)))

    n_win = _n_windows(c)
    # host: exact per-window combine of the bit sums, then the window
    # Horner ladder
    win_pts = []
    bit_aff = []
    for j in range(nbits):
        wx, wy, wz = bit_sums[j]
        xs = mf.cols_to_ints(np.asarray(wx))
        ys = mf.cols_to_ints(np.asarray(wy))
        zs = mf.cols_to_ints(np.asarray(wz))
        pts_j = []
        for w in range(n_win):
            z = zs[w] % Q_MOD
            if z == 0:
                pts_j.append(g1_infinity())
                continue
            zi = inv_mod(z, Q_MOD)
            zi2 = zi * zi % Q_MOD
            pts_j.append(g1_point(xs[w] * zi2 % Q_MOD,
                                  ys[w] * zi2 * zi % Q_MOD))
        bit_aff.append(pts_j)
    for w in range(n_win):
        acc = g1_infinity()
        for j in reversed(range(nbits)):
            acc = acc.double()
            acc = acc.add(bit_aff[j][w])
        win_pts.append(acc)

    acc = g1_infinity()
    for w in reversed(range(n_win)):
        for _ in range(c):
            acc = acc.double()
        acc = acc.add(win_pts[w])
    return acc
