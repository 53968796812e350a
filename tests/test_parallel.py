"""Multi-chip sharded kernels on the virtual 8-device CPU mesh."""

import random

import jax
import numpy as np
import pytest

from aes_zero_knowledge_proof_circuit_tpu.ops import poly_host
from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import (
    digits_to_ints,
    fr_f32,
    ints_to_digits,
)
from aes_zero_knowledge_proof_circuit_tpu.ops.field_params import R_MOD
from aes_zero_knowledge_proof_circuit_tpu.parallel.mesh import make_mesh
from aes_zero_knowledge_proof_circuit_tpu.parallel.sharded_ntt import ntt_sharded

rng = random.Random(17)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_ntt_matches_host():
    import jax.numpy as jnp

    mesh = make_mesh()
    log_n1, log_n2 = 3, 4  # 128 elements, n1 axis sharded over 8 devices
    n = 1 << (log_n1 + log_n2)
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    ops = fr_f32()
    dev = jnp.asarray(ints_to_digits(ops, coeffs))
    got = digits_to_ints(ops, ntt_sharded(mesh, dev, log_n1, log_n2))
    want = poly_host.domain(log_n1 + log_n2).ntt(coeffs)
    assert got == want


def test_sharded_intt_roundtrip():
    import jax.numpy as jnp

    mesh = make_mesh()
    log_n1, log_n2 = 3, 3
    n = 1 << (log_n1 + log_n2)
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    ops = fr_f32()
    dev = jnp.asarray(ints_to_digits(ops, coeffs))
    evals = ntt_sharded(mesh, dev, log_n1, log_n2)
    back = digits_to_ints(
        ops, ntt_sharded(mesh, evals, log_n1, log_n2, inverse=True)
    )
    assert back == coeffs


@pytest.mark.slow
def test_sharded_msm_matches_host():
    from aes_zero_knowledge_proof_circuit_tpu.ops import curve_host as ch
    from aes_zero_knowledge_proof_circuit_tpu.ops import curve_jax as cj
    from aes_zero_knowledge_proof_circuit_tpu.ops import msm_host, msm_jax
    from aes_zero_knowledge_proof_circuit_tpu.parallel.sharded_msm import (
        msm_sharded,
    )

    mesh = make_mesh()
    g = ch.g1_generator()
    n = 16
    pts = [g.mul_scalar(rng.randrange(1, 2**28)) for _ in range(n)]
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    want = msm_host.msm(pts, scalars)
    import jax.numpy as jnp

    got = msm_sharded(
        mesh,
        cj.affine_to_device(pts),
        jnp.asarray(msm_jax.scalars_to_digit_limbs(scalars)),
    )
    assert got == want


@pytest.mark.slow
def test_sharded_msm_deep():
    """Sharded MSM at 512 points (64/device) — the depth check the
    multichip dryrun cannot afford on its cold budget (the eager CPU-mesh
    window sums cost ~1 s/point on a 2-core host; __graft_entry__.py)."""
    from aes_zero_knowledge_proof_circuit_tpu.ops import curve_host as ch
    from aes_zero_knowledge_proof_circuit_tpu.ops import curve_jax as cj
    from aes_zero_knowledge_proof_circuit_tpu.ops import msm_host, msm_jax
    from aes_zero_knowledge_proof_circuit_tpu.parallel.sharded_msm import (
        msm_sharded,
    )

    mesh = make_mesh()
    g = ch.g1_generator()
    n = 512
    step = g.mul_scalar(rng.randrange(1, R_MOD))
    pts = [g.mul_scalar(rng.randrange(1, R_MOD))]
    for _ in range(n - 1):
        pts.append(pts[-1].add(step))
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    want = msm_host.msm(pts, scalars)
    import jax.numpy as jnp

    got = msm_sharded(
        mesh,
        cj.affine_to_device(pts),
        jnp.asarray(msm_jax.scalars_to_digit_limbs(scalars)),
    )
    assert got == want
