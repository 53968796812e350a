"""Sweep (lanes, chunk, conv) for the Pallas MSM scan kernel on real TPU.

Times ONE window's scan at a given size with a REAL device sync (host
fetch of a result element — `block_until_ready` does not block under the
axon remote plugin, which produced the round-3 phantom sub-ms numbers).

Usage: python scripts/sweep_msm_scan.py [log_n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jax.device_get(x[-1, -1]))


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n
    from aes_zero_knowledge_proof_circuit_tpu.ops import msm_pallas as MP
    from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import fq_f32

    fq = fq_f32()
    d = fq.D
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n=2^{log_n} D={d}", flush=True)

    for lanes, chunk, loop_conv in [
        (128, 4, False),   # current production config
        (128, 16, False),
        (256, 8, True),
        (512, 8, True),
        (512, 32, True),
        (1024, 16, True),
    ]:
        steps = n // lanes
        if steps % chunk:
            continue
        px = jnp.asarray(
            rng.integers(0, 255, (steps, lanes, d)).astype(np.float32))
        py = jnp.asarray(
            rng.integers(0, 255, (steps, lanes, d)).astype(np.float32))
        pz = jnp.asarray(
            rng.integers(0, 255, (steps, lanes, d)).astype(np.float32))
        flags = jnp.asarray(
            (rng.random((steps, lanes, 1)) < 0.1).astype(np.float32))
        try:
            call = MP._scan_call(d, steps, lanes, False, chunk, loop_conv)
            t0 = time.time()
            out = call(px, py, pz, flags)
            sync(out[0])
            compile_s = time.time() - t0
            t0 = time.time()
            out = call(px, py, pz, flags)
            sync(out[0])
            warm = time.time() - t0
            print(
                f"lanes={lanes:5d} chunk={chunk:3d} loop={int(loop_conv)}  "
                f"compile {compile_s:6.1f}s  warm {warm*1e3:9.1f} ms  "
                f"{n/warm/1e6:7.2f} Madd/s  "
                f"(MSM ~{n/warm/32/1e6:6.3f} Mpts/s)",
                flush=True,
            )
        except Exception as e:
            print(f"lanes={lanes} chunk={chunk} loop={int(loop_conv)} "
                  f"FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        del px, py, pz, flags


if __name__ == "__main__":
    main()
