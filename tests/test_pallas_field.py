"""Pallas fused Montgomery mul vs the XLA engine (bit-exact).

Runs in interpreter mode on CPU (tests/conftest.py pins the cpu platform);
on-TPU the same kernel compiles to Mosaic."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
    digits_to_ints,
    fq_f32,
    fr_f32,
    ints_to_digits,
)
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import Q_MOD, R_MOD
from aes_zero_knowledge_proof_circuit_tpu.ops.pallas_field import (
    pallas_butterfly,
    pallas_mul,
)

rng = random.Random(77)

INTERP = jax.default_backend() != "tpu"


@pytest.mark.parametrize("which", ["fr", "fq"])
def test_pallas_mul_matches_engine(which):
    ops = fr_f32() if which == "fr" else fq_f32()
    mod = R_MOD if which == "fr" else Q_MOD
    n = 16
    av = [rng.randrange(mod) for _ in range(n)]
    bv = [rng.randrange(mod) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))
    got = pallas_mul(ops, a, b, interpret=INTERP)
    want_vals = [x * y % mod for x, y in zip(av, bv)]
    assert digits_to_ints(ops, got) == want_vals
    # bit-exact against the engine's own digit output
    ref = ops.mul(a, b)
    assert digits_to_ints(ops, ref) == want_vals


def test_pallas_mul_fold_range_inputs():
    """Engine invariant: inputs may sit anywhere in the fold band [0, 6N)
    with digits in (-2, 260) — e.g. outputs of sub(); products must still
    be exact."""
    ops = fr_f32()
    n = 8
    av = [rng.randrange(R_MOD) for _ in range(n)]
    bv = [rng.randrange(R_MOD) for _ in range(n)]
    cv = [rng.randrange(R_MOD) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))
    c = jnp.asarray(ints_to_digits(ops, cv))
    ab = ops.sub(a, b)          # fold-range, possibly negative digits
    got = pallas_mul(ops, ab, c, interpret=INTERP)
    rinv = pow(1 << (16 * ops.ctx.L), R_MOD - 2, R_MOD)
    want = [
        (x - y) % R_MOD * z % R_MOD for x, y, z in zip(av, bv, cv)
    ]
    del rinv
    assert digits_to_ints(ops, got) == want


def test_pallas_mul_broadcast_scalar():
    ops = fr_f32()
    av = [rng.randrange(R_MOD) for _ in range(8)]
    s = rng.randrange(R_MOD)
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, [s])[0])
    got = pallas_mul(ops, a, b[None, :], interpret=INTERP)
    assert digits_to_ints(ops, got) == [x * s % R_MOD for x in av]


def _assert_fold_band(ops, arr):
    """The engine's uniform op contract: digits in (-2, 260) and value
    < ~6N — anything in this band feeds every other engine op exactly."""
    a = np.asarray(arr)
    assert a.min() > -2 and a.max() < 260
    weights = np.array([pow(2, 8 * i) for i in range(ops.D)], object)
    vals = (a.astype(object) * weights).sum(axis=-1)
    assert all(0 <= v < 7 * ops.ctx.modulus for v in vals.reshape(-1))


def test_pallas_butterfly_matches_engine():
    """Fused NTT stage (l + r*tw, l - r*tw): values equal the XLA
    composition mod r, digits inside the engine's fold band (the raw digit
    pattern may differ — the kernel's norm-round schedule is its own)."""
    ops = fr_f32()
    n = 16
    lv = [rng.randrange(R_MOD) for _ in range(n)]
    rv = [rng.randrange(R_MOD) for _ in range(n)]
    tv = [rng.randrange(R_MOD) for _ in range(n)]
    l = jnp.asarray(ints_to_digits(ops, lv))
    r = jnp.asarray(ints_to_digits(ops, rv))
    tw = jnp.asarray(ints_to_digits(ops, tv))
    hi, lo = pallas_butterfly(ops, l, r, tw, interpret=INTERP)
    want_hi = [(x + y * t) % R_MOD for x, y, t in zip(lv, rv, tv)]
    want_lo = [(x - y * t) % R_MOD for x, y, t in zip(lv, rv, tv)]
    assert digits_to_ints(ops, hi) == want_hi
    assert digits_to_ints(ops, lo) == want_lo
    _assert_fold_band(ops, hi)
    _assert_fold_band(ops, lo)


def test_pallas_butterfly_broadcast_twiddle():
    """The NTT stages broadcast a [1, half, D] twiddle over n/m groups."""
    ops = fr_f32()
    groups, half = 4, 8
    lv = [rng.randrange(R_MOD) for _ in range(groups * half)]
    rv = [rng.randrange(R_MOD) for _ in range(groups * half)]
    tv = [rng.randrange(R_MOD) for _ in range(half)]
    l = jnp.asarray(ints_to_digits(ops, lv)).reshape(groups, half, ops.D)
    r = jnp.asarray(ints_to_digits(ops, rv)).reshape(groups, half, ops.D)
    tw = jnp.asarray(ints_to_digits(ops, tv))[None, :, :]
    hi, lo = pallas_butterfly(ops, l, r, tw, interpret=INTERP)
    tv_full = tv * groups
    want_hi = [(x + y * t) % R_MOD for x, y, t in zip(lv, rv, tv_full)]
    want_lo = [(x - y * t) % R_MOD for x, y, t in zip(lv, rv, tv_full)]
    assert digits_to_ints(ops, hi.reshape(-1, ops.D)) == want_hi
    assert digits_to_ints(ops, lo.reshape(-1, ops.D)) == want_lo


def test_ntt_engine_pallas_path_value_exact():
    """NTTEngine with fused Pallas butterflies == the XLA engine as field
    values, every output position, both directions (interpret on CPU)."""
    from aes_zero_knowledge_proof_circuit_tpu.ops.ntt_jax import NTTEngine

    log_n = 5
    ref = NTTEngine(log_n, use_pallas=False)
    pal = NTTEngine(log_n, use_pallas=True, interpret=INTERP)
    ops = ref.ops
    vals = [rng.randrange(R_MOD) for _ in range(1 << log_n)]
    x = jnp.asarray(ints_to_digits(ops, vals))
    assert digits_to_ints(ops, pal.ntt(x)) == digits_to_ints(ops, ref.ntt(x))
    ev = ref.ntt(x)
    assert digits_to_ints(ops, pal.intt(ev)) == digits_to_ints(ops, ref.intt(ev))
    _assert_fold_band(ops, pal.ntt(x))
    assert digits_to_ints(ops, ref.intt(pal.ntt(x))) == vals


def test_mul_digits_loop_matches_engine():
    """The loop-conv Montgomery product (fori + aligned pltpu.roll; the
    VMEM-lean alternative used to explore wider MSM lanes) is value-exact
    vs the engine. Runs the kernel math directly (pure jnp + interpretable
    roll) via a tiny pallas_call in interpret mode."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aes_zero_knowledge_proof_circuit_tpu.ops.pallas_field import (
        mul_digits_loop,
    )

    ops = fq_f32()
    d = ops.D
    n = 8
    av = [rng.randrange(Q_MOD) for _ in range(n)]
    bv = [rng.randrange(Q_MOD) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))

    def kern(a_ref, b_ref, tnp, tn, twon, cw, o_ref):
        o_ref[:] = mul_digits_loop(
            a_ref[:], b_ref[:], tnp[:], tn[:], twon[:],
            ops.inv_2n_scaled, cw[:],
        )

    spec = lambda r, c: pl.BlockSpec((r, c), lambda: (0, 0),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        in_specs=[spec(n, d), spec(n, d), spec(d, d), spec(d, 2 * d),
                  spec(1, d), spec(1, d)],
        out_specs=spec(n, d),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=True,
    )
    got = call(a, b, ops.t_nprime, ops.t_n, ops.two_n.reshape(1, d),
               ops.carry_w.reshape(1, d))
    assert digits_to_ints(ops, got) == [
        x * y % Q_MOD for x, y in zip(av, bv)
    ]


def test_pallas_mul_odd_length_padding():
    ops = fr_f32()
    n = 13  # not a multiple of any tile size
    av = [rng.randrange(R_MOD) for _ in range(n)]
    bv = [rng.randrange(R_MOD) for _ in range(n)]
    a = jnp.asarray(ints_to_digits(ops, av))
    b = jnp.asarray(ints_to_digits(ops, bv))
    got = pallas_mul(ops, a, b, interpret=INTERP)
    assert digits_to_ints(ops, got) == [
        x * y % R_MOD for x, y in zip(av, bv)
    ]
