"""Device-MSM phase microbenchmark (real TPU).

Times each phase of the Pallas bucket MSM (sort / gather / scan /
scatter+merge / suffix-fold) plus the fused field-mul roofline, to steer
kernel work on the single biggest prover lever (the commit MSMs are ~90%
of warm prove time; VERDICT round-3 weak #3).

Usage:  python scripts/bench_msm_device.py [log_n] [--full]
Prints one line per phase: name, ms, and derived Mpoints/s where
meaningful.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.time() - t0) / reps, r


def main():
    log_n = 18
    for a in sys.argv[1:]:
        if a.isdigit():
            log_n = int(a)
    n = 1 << log_n
    print(f"backend={jax.default_backend()} n=2^{log_n}", flush=True)

    from aes_zero_knowledge_proof_circuit_tpu.ops import msm_pallas as MP
    from aes_zero_knowledge_proof_circuit_tpu.ops.curve_jax import JacPoint
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import fq_f32
    from aes_zero_knowledge_proof_circuit_tpu.ops.pallas_field import (
        pallas_mul,
    )

    fq = fq_f32()
    d = fq.D
    rng = np.random.default_rng(0)

    # field-mul roofline: [n, D] fused pallas mul
    a = jnp.asarray(rng.integers(0, 255, (n, d)).astype(np.float32))
    b = jnp.asarray(rng.integers(0, 255, (n, d)).astype(np.float32))
    ms, _ = t(lambda: pallas_mul(fq, a, b))
    print(f"pallas_mul [n,{d}]      {ms*1e3:8.1f} ms  "
          f"{n/ms/1e6:8.2f} Mmul/s", flush=True)

    # synthetic points (random digit tensors are fine for timing: the
    # kernel's work is data-independent)
    px = jnp.asarray(rng.integers(0, 255, (n, d)).astype(np.float32))
    py = jnp.asarray(rng.integers(0, 255, (n, d)).astype(np.float32))
    pz = jnp.asarray(rng.integers(0, 255, (n, d)).astype(np.float32))
    pts = JacPoint(px, py, pz)
    digits16 = jnp.asarray(
        rng.integers(0, 1 << 16, (n, 16)).astype(np.uint32)
    )

    # phase: window digit extraction + argsort + gather (per window)
    dwin = MP._window_digits(digits16)[0]

    ms, order = t(jax.jit(jnp.argsort), dwin)
    print(f"argsort                {ms*1e3:8.1f} ms", flush=True)

    lanes = MP.DEFAULT_LANES
    steps = n // lanes

    @jax.jit
    def gather(px, py, pz, dwin, order):
        oc = order.reshape(lanes, steps).swapaxes(0, 1)
        return px[oc], py[oc], pz[oc], dwin[oc]

    ms, (sx, sy, sz, ds) = t(gather, px, py, pz, dwin, order)
    print(f"gather 3x[n,{d}]        {ms*1e3:8.1f} ms", flush=True)

    # phase: the Pallas scan kernel alone
    first = jnp.ones((1, lanes), bool)
    newseg = jnp.concatenate([first, ds[1:] != ds[:-1]], axis=0)
    flags = newseg.astype(jnp.float32)[..., None]
    scan = MP._scan_call(d, steps, lanes, False)
    ms, _ = t(scan, sx, sy, sz, flags)
    adds = n
    print(f"scan kernel            {ms*1e3:8.1f} ms  "
          f"{adds/ms/1e6:8.2f} Madd/s   (lanes={lanes}, "
          f"chunk={MP.SCAN_CHUNK})", flush=True)

    # phase: one full window program (sort+gather+scan+scatter+merge)
    prog = MP._bucket_tables_jit(lanes, False, True)
    ms, _ = t(prog, px, py, pz, dwin)
    print(f"window program         {ms*1e3:8.1f} ms", flush=True)

    if "--full" in sys.argv:
        ms, _ = t(lambda: MP.pallas_window_sums(pts, digits16), reps=1)
        print(f"full 32-window MSM     {ms*1e3:8.1f} ms  "
              f"{n/ms/1e6:8.3f} Mpoints/s", flush=True)


if __name__ == "__main__":
    main()
