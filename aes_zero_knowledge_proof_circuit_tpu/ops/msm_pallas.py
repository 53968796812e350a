"""Work-optimal Pippenger MSM with a Pallas bucket-scan kernel (TPU).

TPU-native re-creation of ark-ec's VariableBaseMSM at the KZG commit/open
call sites (SURVEY.md §2b ark-ec row: "Pallas Pippenger MSM", §7 step 5).
This replaces both earlier device formulations:

  * eager per-level dispatch (msm_jax._window_sums): thousands of device
    round-trips per MSM — tunnel-latency-bound;
  * msm_fused's scatter-inside-fori_loop: work-optimal but an XLA:TPU
    compile pathology (>20 min remote compiles).

Formulation (per 8-bit window):
  1. XLA argsort of the window digits; ONE gather lands the points
     directly in a [steps, lanes] column-major layout (lane j owns the
     contiguous sorted run j*steps..(j+1)*steps — runs stay contiguous so
     segments rarely straddle lanes).
  2. Pallas scan kernel: the TPU grid is sequential, so a VMEM scratch
     accumulator carries across grid steps. Per step, one [lanes, D]
     segmented mixed-add:  acc = flag ? p : acc + p. Exactly n point-adds
     per window — Pippenger's optimal data-phase count — all field math
     in VMEM (bf16 MXU REDC matmuls, f32 digit ladders).
  3. Segment tails (boundary positions, known from the sorted digits) are
     scattered into per-lane bucket tables by a SINGLE top-level XLA
     scatter — scatters only pathologize XLA:TPU inside loops.
  4. Lane tables tree-merge (log2(lanes) batched jac_adds), buckets
     suffix-fold, windows combine host-side.

Degenerate-case contract: the scan kernel uses an INCOMPLETE mixed
addition (no doubling / P==-Q branch). A degenerate would need
sum_{i in S} tau^i == +-tau^j over distinct SRS indices — a nontrivial
polynomial identity in the (honestly sampled) SRS secret, probability
~2^-233. The merge/fold phases reuse the complete branchless jac_add.
Bucket sums CAN collide there, so completeness matters — and costs
nothing off the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve_host import AffinePoint
from .curve_jax import JacPoint, jac_add
from .field_f32 import fq_f32
from .pallas_field import _norm_val, mul_digits, mul_digits_loop

WINDOW_BITS = 8
# 256 lanes exceed the 16MB scoped-VMEM limit (the unrolled madd keeps
# ~180 conv buffers live on Mosaic's stack). The loop-conv variant
# (pallas_field.mul_digits_loop) fits 512 lanes but measured SLOWER —
# its 50 sequential fori iterations serialize on VPU op latency that the
# unrolled form lets Mosaic interleave. Measured on one v5e: ~0.04
# Mpoints/s — roughly the 2-core native OpenMP tier; prover commits
# therefore default to native (prover_jax) until this kernel wins.
DEFAULT_LANES = 128


# ---------------------------------------------------------------------------
# kernel-local Fq helpers (constants embedded; everything stays in VMEM)
# ---------------------------------------------------------------------------


class _KernelField:
    """In-kernel Fq math over loaded constant values (Pallas requires
    constants to enter as kernel inputs, not captures)."""

    def __init__(self, tnp, tn, twon, c16n, cw, one, inv_2n: float,
                 loop_conv: bool = False):
        self.d = tnp.shape[0]
        self.tnp = tnp
        self.tn = tn
        self.twon = twon
        self.c16n = c16n
        self.cw = cw
        self.inv_2n = inv_2n
        self.one = one
        self._mul = mul_digits_loop if loop_conv else mul_digits

    def mul(self, a, b):
        return self._mul(a, b, self.tnp, self.tn, self.twon, self.inv_2n,
                         self.cw)

    def _fold(self, x):
        d = self.d
        est = (
            x[..., d - 1] * 16777216.0
            + x[..., d - 2] * 65536.0
            + x[..., d - 3] * 256.0
            + x[..., d - 4]
        ) * self.inv_2n
        m = jnp.maximum(jnp.floor(est) - 1.0, 0.0)
        return _norm_val(x - m[..., None] * self.twon, 2)

    def add(self, a, b):
        return self._fold(a + b)

    def sub(self, a, b):
        return self._fold(a - b + self.c16n)


def _madd_incomplete(f: _KernelField, ax, ay, az, qx, qy, qz):
    """Mixed add acc(Jacobian) + q(affine-or-infinity), INCOMPLETE:
    assumes acc != +-q as group elements (see module contract). Handles
    either side at infinity. madd-2007-bl, 8 Fq muls."""
    z1z1 = f.mul(az, az)
    u2 = f.mul(qx, z1z1)
    s2 = f.mul(f.mul(qy, az), z1z1)
    h = f.sub(u2, ax)
    hh = f.mul(h, h)
    i4 = f.add(hh, hh)
    i4 = f.add(i4, i4)
    j = f.mul(h, i4)
    r = f.sub(s2, ay)
    r = f.add(r, r)
    v = f.mul(ax, i4)
    r2 = f.mul(r, r)
    x3 = f.sub(f.sub(r2, j), f.add(v, v))
    y1j = f.mul(ay, j)
    y3 = f.sub(f.mul(r, f.sub(v, x3)), f.add(y1j, y1j))
    zh = f.add(az, h)
    z3 = f.sub(f.sub(f.mul(zh, zh), z1z1), hh)

    a_inf = jnp.all(az == 0.0, axis=-1, keepdims=True)
    q_inf = jnp.all(qz == 0.0, axis=-1, keepdims=True)
    one = jnp.broadcast_to(f.one, az.shape)
    ox = jnp.where(a_inf, qx, jnp.where(q_inf, ax, x3))
    oy = jnp.where(a_inf, qy, jnp.where(q_inf, ay, y3))
    oz = jnp.where(a_inf, jnp.where(q_inf, az, one),
                   jnp.where(q_inf, az, z3))
    return ox, oy, oz


# scan-steps processed per grid step: amortizes the ~100us fixed per-grid-
# step cost (block DMA descriptor setup dominated the first measurement:
# 2^20 MSM = 262k one-row grid steps = 27s). The chunk iterations run as an
# in-kernel fori_loop with pl.ds dynamic slices — a python unroll at
# chunk=16 cost Mosaic >15 min of compile; the loop body compiles once.
# block quantum per grid step (double-buffered; loop-conv keeps temps flat)
SCAN_CHUNK = 4


def _scan_kernel(px_ref, py_ref, pz_ref, flag_ref, tnp_ref, tn_ref,
                 twon_ref, c16n_ref, cw_ref, one_ref,
                 ox_ref, oy_ref, oz_ref, accx, accy, accz, *,
                 inv_2n: float, chunk: int, loop_conv: bool):
    """One grid step = CHUNK sequential [lanes, D] segmented accumulates;
    the VMEM scratch acc persists across the (sequential) TPU grid."""
    field = _KernelField(tnp_ref[:], tn_ref[:], twon_ref[:], c16n_ref[:],
                         cw_ref[:], one_ref[:], inv_2n, loop_conv=loop_conv)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        accx[:] = jnp.zeros_like(accx)
        accy[:] = jnp.zeros_like(accy)
        accz[:] = jnp.zeros_like(accz)

    def body(c, acc):
        ax, ay, az = acc
        sl = (pl.ds(c, 1), slice(None), slice(None))
        qx = px_ref[sl][0]
        qy = py_ref[sl][0]
        qz = pz_ref[sl][0]
        flag = flag_ref[sl][0] != 0.0              # [lanes, 1]
        sx, sy, sz = _madd_incomplete(field, ax, ay, az, qx, qy, qz)
        ax = jnp.where(flag, qx, sx)
        ay = jnp.where(flag, qy, sy)
        az = jnp.where(flag, qz, sz)
        ox_ref[sl] = ax[None]
        oy_ref[sl] = ay[None]
        oz_ref[sl] = az[None]
        return ax, ay, az

    acc0 = (accx[0], accy[0], accz[0])             # [lanes, D]
    ax, ay, az = jax.lax.fori_loop(0, chunk, body, acc0)
    accx[0] = ax
    accy[0] = ay
    accz[0] = az


@functools.lru_cache(maxsize=None)
def _scan_call(d: int, steps: int, lanes: int, interpret: bool,
               chunk: int | None = None, loop_conv: bool | None = None):
    ops = fq_f32()
    if chunk is None:
        chunk = SCAN_CHUNK
    if loop_conv is None:
        loop_conv = lanes > 128
    chunk = chunk if steps % chunk == 0 else 1
    row = pl.BlockSpec((chunk, lanes, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    flg = pl.BlockSpec((chunk, lanes, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((steps, lanes, d), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_scan_kernel, inv_2n=ops.inv_2n_scaled,
                          chunk=chunk, loop_conv=loop_conv),
        grid=(steps // chunk,),
        in_specs=[
            row, row, row, flg,
            const(d, d), const(d, 2 * d), const(1, d), const(1, d),
            const(1, d), const(1, d),
        ],
        out_specs=[row, row, row],
        out_shape=[shp, shp, shp],
        scratch_shapes=[
            pltpu.VMEM((1, lanes, d), jnp.float32),
            pltpu.VMEM((1, lanes, d), jnp.float32),
            pltpu.VMEM((1, lanes, d), jnp.float32),
        ],
        interpret=interpret,
    )

    def run(px, py, pz, flags):
        return call(
            px, py, pz, flags, ops.t_nprime, ops.t_n,
            ops.two_n.reshape(1, d), ops.c16n.reshape(1, d),
            ops.carry_w.reshape(1, d), ops.one_mont.reshape(1, d),
        )

    return run


# ---------------------------------------------------------------------------
# per-window program (sort -> scan -> scatter -> merge -> fold)
# ---------------------------------------------------------------------------


def _bucket_tables(px, py, pz, dwin, lanes: int, interpret: bool,
                   merge: bool):
    """One window's bucket phase up to the per-lane tables (optionally
    lane-merged). Every op here is a top-level XLA op or the Pallas scan —
    no scatter lives inside a loop."""
    fq = fq_f32()
    d = fq.D
    n = dwin.shape[0]
    steps = n // lanes
    b = 1 << WINDOW_BITS

    order = jnp.argsort(dwin)
    # column-major landing: lane j <- sorted run [j*steps, (j+1)*steps)
    oc = order.reshape(lanes, steps).swapaxes(0, 1)          # [steps, lanes]
    ds = dwin[oc]
    sx, sy, sz = px[oc], py[oc], pz[oc]                      # [steps,lanes,D]

    first = jnp.ones((1, lanes), bool)
    newseg = jnp.concatenate([first, ds[1:] != ds[:-1]], axis=0)
    flags = newseg.astype(jnp.float32)[..., None]            # [steps,lanes,1]

    accx, accy, accz = _scan_call(d, steps, lanes, interpret)(
        sx, sy, sz, flags
    )

    # segment tails: last step of each lane, or positions where the next
    # step starts a new segment
    last = jnp.ones((1, lanes), bool)
    is_tail = jnp.concatenate([newseg[1:], last], axis=0)
    dump = b
    target = jnp.where(is_tail & (ds > 0), ds.astype(jnp.int32), dump)
    lane_ix = jnp.broadcast_to(
        jnp.arange(lanes, dtype=jnp.int32)[None, :], (steps, lanes)
    )
    flat_t = target.reshape(-1)
    flat_l = lane_ix.reshape(-1)

    def scat(acc):
        tbl = jnp.zeros((lanes, b + 1, d), jnp.float32)
        return tbl.at[flat_l, flat_t].set(acc.reshape(-1, d))

    cur = JacPoint(scat(accx)[:, :b], scat(accy)[:, :b], scat(accz)[:, :b])
    if not merge:
        return cur.x, cur.y, cur.z
    while cur.x.shape[0] > 1:
        h = cur.x.shape[0] // 2
        cur = jac_add(
            JacPoint(cur.x[:h], cur.y[:h], cur.z[:h]),
            JacPoint(cur.x[h:], cur.y[h:], cur.z[h:]),
        )
    return cur.x[0], cur.y[0], cur.z[0]                      # [B, D] x3


def _suffix_fold(bx, by, bz):
    """Window sums from merged bucket tables, batched over the leading
    window axis: sum_{j>=1} S_j with S_j = sum_{d>=j} B_d (scans along the
    bucket axis)."""
    from .scan_utils import hillis_scan

    swap = lambda a: jnp.swapaxes(a, 0, 1)                   # [B, W, D]
    buckets = JacPoint(swap(bx), swap(by), swap(bz))
    suffix = hillis_scan(jac_add, buckets, reverse=True)
    tail = JacPoint(suffix.x[1:], suffix.y[1:], suffix.z[1:])
    zrow = jnp.zeros((1,) + tail.x.shape[1:], jnp.float32)
    tail = JacPoint(
        jnp.concatenate([tail.x, zrow]),
        jnp.concatenate([tail.y, zrow]),
        jnp.concatenate([tail.z, zrow]),
    )
    total = hillis_scan(jac_add, tail, reverse=True)
    return total.x[0], total.y[0], total.z[0]                # [W, D] x3


@functools.lru_cache(maxsize=None)
def _bucket_tables_jit(lanes: int, interpret: bool, merge: bool):
    return jax.jit(functools.partial(
        _bucket_tables, lanes=lanes, interpret=interpret, merge=merge
    ))


@functools.lru_cache(maxsize=None)
def _suffix_fold_jit():
    return jax.jit(_suffix_fold)


def _window_digits(digits16: jnp.ndarray):
    mask = jnp.uint32((1 << WINDOW_BITS) - 1)
    out = []
    for limb in range(digits16.shape[1]):
        for half in range(2):
            out.append((
                (digits16[:, limb] >> jnp.uint32(WINDOW_BITS * half)) & mask
            ).astype(jnp.int32))
    return out


def pallas_window_sums(points: JacPoint, digits16: jnp.ndarray,
                       lanes: int = DEFAULT_LANES,
                       interpret: bool | None = None) -> JacPoint:
    """[n_win]-batched window sums (8-bit windows) via the Pallas bucket
    scan.

    TPU: two compiled programs — per-window (sort+scan+scatter+lane-merge,
    one dispatch each) and one batched suffix-fold — 33 dispatches total.
    CPU (tests): the same kernel numerics in interpret mode, with the
    merge/fold phases composed eagerly (XLA:CPU takes minutes to compile a
    single fat jac_add graph — the msm_jax pathology)."""
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    n = digits16.shape[0]
    lanes = min(lanes, max(8, 1 << max(0, (n.bit_length() - 1) // 2)))
    # pad to the next power of two: the chunked scan kernel costs minutes
    # of Mosaic compile per distinct (steps, lanes) shape, so quantize MSM
    # lengths to a handful of shapes (2^k), disk-cached once each. Padding
    # points are infinity and padding digits 0: both absorbed.
    if n > lanes * SCAN_CHUNK:
        target = 1 << (n - 1).bit_length()
    else:
        target = -(-n // lanes) * lanes
    pad = target - n
    if pad:
        zp = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
        )
        points = JacPoint(zp(points.x), zp(points.y), zp(points.z))
        digits16 = zp(digits16)
    if on_tpu:
        prog = _bucket_tables_jit(lanes, interpret, True)
        merged = [
            prog(points.x, points.y, points.z, dwin)
            for dwin in _window_digits(digits16)
        ]
        bx, by, bz = (jnp.stack([m[i] for m in merged]) for i in range(3))
        wx, wy, wz = _suffix_fold_jit()(bx, by, bz)
        return JacPoint(wx, wy, wz)
    # CPU path: eager merge/fold over per-lane tables
    from .msm_jax import _add_fn
    from .scan_utils import hillis_scan

    prog = _bucket_tables_jit(lanes, interpret, False)
    add = _add_fn()
    xs, ys, zs = [], [], []
    for dwin in _window_digits(digits16):
        tx, ty, tz = prog(points.x, points.y, points.z, dwin)
        cur = JacPoint(tx, ty, tz)
        while cur.x.shape[0] > 1:
            h = cur.x.shape[0] // 2
            cur = add(
                JacPoint(cur.x[:h], cur.y[:h], cur.z[:h]),
                JacPoint(cur.x[h:], cur.y[h:], cur.z[h:]),
            )
        buckets = JacPoint(cur.x[0], cur.y[0], cur.z[0])
        suffix = hillis_scan(add, buckets, reverse=True)
        tail = JacPoint(suffix.x[1:], suffix.y[1:], suffix.z[1:])
        zrow = jnp.zeros((1, buckets.x.shape[-1]), jnp.float32)
        tail = JacPoint(
            jnp.concatenate([tail.x, zrow]),
            jnp.concatenate([tail.y, zrow]),
            jnp.concatenate([tail.z, zrow]),
        )
        total = hillis_scan(add, tail, reverse=True)
        xs.append(total.x[0])
        ys.append(total.y[0])
        zs.append(total.z[0])
    return JacPoint(jnp.stack(xs), jnp.stack(ys), jnp.stack(zs))


def msm_pallas(points: JacPoint, digits16: jnp.ndarray,
               lanes: int = DEFAULT_LANES,
               interpret: bool | None = None) -> AffinePoint:
    """Full MSM: Pallas bucket phase + host window combine."""
    from .msm_jax import _fold_windows

    wsums = pallas_window_sums(points, digits16, lanes=lanes,
                               interpret=interpret)
    return _fold_windows(wsums, WINDOW_BITS)
