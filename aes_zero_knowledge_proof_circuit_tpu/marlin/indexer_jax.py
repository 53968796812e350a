"""Marlin indexing with device-side NTTs and commitments.

Same protocol output as marlin/indexer.index (the host oracle), but the
index-polynomial interpolations and the 9 KZG commitments run on device —
at AES scale (|K| ~ 2^19) the host path would spend minutes in Python NTTs
and hours in MSMs (reference analog: generate_proving_and_verifying_keys,
src/lib.rs:173, SURVEY.md §3.1 "12 index polys ... commit [FFT+MSM; HOT]").

The returned MarlinProvingKey carries `coeff = None` matrix polys (device
recomputes them in JaxProver) plus a cached DevicePoints handle for the SRS.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..models.r1cs import R1CS
from ..ops import kzg, poly_jax as P
from ..ops.field_f32 import fr_f32
from ..ops.field_params import R_MOD, inv_mod
from ..ops.msm_jax import DevicePoints, msm_device
from ..ops.poly_host import domain
from .indexer import (
    MarlinProvingKey,
    MarlinVerifyingKey,
    MatrixIndex,
    _next_pow2_log,
)

F = fr_f32()


def index_jax(r1cs: R1CS, srs: kzg.SRS) -> MarlinProvingKey:
    log_x = _next_pow2_log(r1cs.num_instance)
    x_size = 1 << log_x
    log_n = _next_pow2_log(max(r1cs.num_constraints, r1cs.num_variables))
    while (1 << log_n) - x_size < r1cs.num_witness or (1 << log_n) < x_size:
        log_n += 1
    n = 1 << log_n
    h = domain(log_n)

    stride = n // x_size
    var_to_slot = [0] * r1cs.num_variables
    reserved = set(range(0, n, stride))
    for j in range(r1cs.num_instance):
        var_to_slot[j] = j * stride
    free_slots = [s for s in range(n) if s not in reserved]
    for w in range(r1cs.num_witness):
        var_to_slot[r1cs.num_instance + w] = free_slots[w]

    # commit backend: mirrors JaxProver — "auto" prefers native (see
    # prover_jax.JaxProver.__init__ rationale)
    import os as _os

    from .. import native as _native

    srs_packed = getattr(srs.powers_g1, "packed", None)
    native_ok = _native.available() and srs_packed is not None
    choice = _os.environ.get("ZKAES_COMMIT_BACKEND", "auto")
    if choice == "auto":
        choice = "native" if native_ok else "device"
    native_commits = choice == "native" and native_ok
    srs_dev = None if native_commits else DevicePoints(srs.powers_g1)
    h_pows = P.powers(P.scalar(h.omega), n)
    n_inv = P.scalar(inv_mod(n, R_MOD))

    matrices: List[MatrixIndex] = []
    comms: List[kzg.Commitment] = []
    coo_np = []
    v2s = np.asarray(var_to_slot, np.int32)
    for rows in (r1cs.a_rows, r1cs.b_rows, r1cs.c_rows):
        ri_l, ci_l, vv_l = [], [], []
        for i, row in enumerate(rows):
            for c, v in sorted(row.items()):
                ri_l.append(i)
                ci_l.append(c)
                vv_l.append(v if v < R_MOD // 2 else v - R_MOD)
        nnz = len(vv_l)
        log_k = _next_pow2_log(nnz)
        k = 1 << log_k
        ri = np.asarray(ri_l, np.int32)
        ci = np.asarray(ci_l, np.int32)
        vals_np = np.asarray(vv_l, np.int64)
        # _small_to_mont decomposes 3 bytes: anything >= 2^24 would be
        # silently truncated to a wrong field element, so reject it here
        assert np.abs(vals_np).max(initial=0) < (1 << 24), (
            "matrix coefficient exceeds 2^24 (unsupported by device path)"
        )
        coo_np.append((ri, ci, vals_np.astype(np.int32)))
        pad = k - nnz
        row_slots = np.pad(ri, (0, pad))
        col_slots = np.pad(v2s[ci], (0, pad))
        vals_signed = np.pad(vals_np, (0, pad))

        row_evals = h_pows[jnp.asarray(row_slots)]
        col_evals = h_pows[jnp.asarray(col_slots)]
        from .prover_jax import _small_to_mont

        val_raw = _small_to_mont(jnp.asarray(vals_signed.astype(np.int32)))
        val_norm = F.mul(F.mul(val_raw, col_evals), n_inv[None, :])
        row_coeffs = P.intt(log_k, row_evals)
        col_coeffs = P.intt(log_k, col_evals)
        val_coeffs = P.intt(log_k, val_norm)

        def commit_dev(coeffs):
            from .prover_jax import to_msm_digits

            digits = to_msm_digits(coeffs)
            if native_commits:
                pt = _native.g1_msm_packed(
                    srs_packed[: digits.shape[0]],
                    _native.limbs16_to_u64(np.asarray(digits)),
                )
                return kzg.Commitment(pt)
            return kzg.Commitment(
                msm_device(srs_dev.slice(0, digits.shape[0]), digits)
            )

        comm_row = commit_dev(row_coeffs)
        comm_col = commit_dev(col_coeffs)
        comm_val = commit_dev(val_coeffs)
        comms += [comm_row, comm_col, comm_val]
        matrices.append(
            MatrixIndex(
                log_k=log_k,
                nnz=nnz,
                # np-backed (jax indexing path): slots int32, vals SIGNED
                # int64 (v - r for v >= r/2) — the host indexer keeps raw
                # field-value lists instead.
                row_slots=row_slots,
                col_slots=col_slots,
                vals=vals_signed,
                row_evals=None,
                col_evals=None,
                val_evals=None,
                row_coeffs=None,
                col_coeffs=None,
                val_coeffs=None,
                comm_row=comm_row,
                comm_col=comm_col,
                comm_val=comm_val,
            )
        )

    need = max(2 * n + 2, 2 * max(m.k for m in matrices))
    assert srs.max_degree >= need, (
        f"SRS degree {srs.max_degree} below required {need}"
    )
    vk = MarlinVerifyingKey(
        kzg_vk=srs.verifier_part(),
        log_n=log_n,
        log_x=log_x,
        num_instance=r1cs.num_instance,
        log_ks=[m.log_k for m in matrices],
        max_degree=srs.max_degree,
        index_comms=comms,
    )
    pk = MarlinProvingKey(
        srs=srs,
        vk=vk,
        r1cs=r1cs,
        log_n=log_n,
        log_x=log_x,
        var_to_slot=var_to_slot,
        matrices=matrices,
    )
    pk._srs_dev = srs_dev
    pk.coo_np = coo_np          # prover fast path: skip python COO re-walk
    return pk
