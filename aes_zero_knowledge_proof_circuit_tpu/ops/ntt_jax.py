"""Radix-2 NTT over Fr float32 digits — the prover's FFT engine.

TPU-native equivalent of ark-poly's radix-2 GeneralEvaluationDomain
(SURVEY.md §2b) and the hot loop of every Marlin round (SURVEY.md §3.2:
"iFFT/FFT over H (~2^20)").

Decimation-in-time over [n, D] f32 digit tensors (ops/field_f32.py): a
static bit-reversal gather, then log2(n) butterfly stages, each one batched
Montgomery multiply (flat graph: digit fma ladder + two MXU Toeplitz
matmuls) of n/2 twiddled elements plus modular add/sub. Twiddles are
host-precomputed in Montgomery digit form and baked into the jitted program
(one compilation per domain size). Multi-chip sharding lives in
parallel/sharded_ntt.py.

Bit-exact against ops/poly_host.Domain (tests/test_ntt_jax.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field_f32 import F32Ops, fr_f32, ints_to_digits
from .field_params import R_MOD, inv_mod, root_of_unity


def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle digit tensors (Montgomery form), host-computed."""
    n = 1 << log_n
    omega = root_of_unity(log_n)
    if inverse:
        omega = inv_mod(omega, R_MOD)
    ops = fr_f32()
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(omega, n // m, R_MOD)
        tw = [1] * (m // 2)
        for j in range(1, m // 2):
            tw[j] = tw[j - 1] * w_m % R_MOD
        out.append(ints_to_digits(ops, tw))
    return out


class NTTEngine:
    """One compiled forward+inverse NTT per domain size."""

    def __init__(self, log_n: int, ops: F32Ops | None = None):
        self.log_n = log_n
        self.n = 1 << log_n
        self.ops = ops or fr_f32()
        # ensure_compile_time_eval: engines are lru-cached, so constants must
        # be concrete even if the first construction happens inside a trace
        # (else cached tracers leak into later jit calls).
        with jax.ensure_compile_time_eval():
            self._perm = jnp.asarray(_bitrev_perm(log_n))
            self._fwd_tw = [
                jnp.asarray(t) for t in _stage_twiddles(log_n, False)
            ]
            self._inv_tw = [
                jnp.asarray(t) for t in _stage_twiddles(log_n, True)
            ]
            n_inv = inv_mod(self.n, R_MOD)
            self._n_inv = jnp.asarray(ints_to_digits(self.ops, [n_inv])[0])
        self.ntt = jax.jit(self._ntt)
        self.intt = jax.jit(self._intt)

    def _core(self, x: jnp.ndarray, twiddles) -> jnp.ndarray:
        ops = self.ops
        d = ops.D
        x = x[self._perm]
        for s in range(1, self.log_n + 1):
            m = 1 << s
            half = m // 2
            xs = x.reshape(self.n // m, m, d)
            left = xs[:, :half]
            right = ops.mul(xs[:, half:], twiddles[s - 1][None, :, :])
            x = jnp.concatenate(
                [ops.add(left, right), ops.sub(left, right)], axis=1
            ).reshape(self.n, d)
        return x

    def _ntt(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """[n, D] Montgomery digit coeffs -> evaluations (natural order)."""
        return self._core(coeffs, self._fwd_tw)

    def _intt(self, evals: jnp.ndarray) -> jnp.ndarray:
        out = self._core(evals, self._inv_tw)
        return self.ops.mul(out, self._n_inv[None, :])


@functools.lru_cache(maxsize=None)
def ntt_engine(log_n: int) -> NTTEngine:
    return NTTEngine(log_n)
