#!/usr/bin/env python
"""TPU microbenchmarks: NTT 2^20 (Pallas vs XLA butterflies) + Pallas MSM.

Writes artifacts/microbench_tpu.json — the per-kernel numbers BASELINE.md
asks for (NTT 2^20 wall-clock, MSM Mpoints/s) measured on the real chip.
Run:  python scripts/bench_micro_tpu.py [--no-msm]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import faulthandler

    faulthandler.dump_traceback_later(1200, repeat=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0])}

    from aes_zero_knowledge_proof_circuit_tpu.ops.field_f32 import fr_f32
    from aes_zero_knowledge_proof_circuit_tpu.ops.ntt_jax import NTTEngine

    F = fr_f32()
    rng = np.random.default_rng(0)
    log_n = 20
    raw = rng.integers(0, 256, size=(1 << log_n, F.D), dtype=np.int64)
    x = F.mul(jnp.asarray(raw, jnp.float32), F.r2_digits)

    def _sync(a):
        # block_until_ready is a no-op under the axon remote plugin (the
        # round-3 phantom sub-ms numbers) — a one-element fetch is a real
        # execution barrier.
        np.asarray(jax.device_get(a[-1, -1]))

    for label, use_pallas in (("ntt_2pow20_pallas_ms", True),
                              ("ntt_2pow20_xla_ms", False)):
        eng = NTTEngine(log_n, use_pallas=use_pallas)
        t0 = time.time()
        _sync(eng.ntt(x))
        compile_s = time.time() - t0
        iters = 5
        t0 = time.time()
        y = x
        for _ in range(iters):
            y = eng.ntt(y)
        _sync(y)
        ms = (time.time() - t0) / iters * 1000
        out[label] = round(ms, 2)
        out[label + "_compile_s"] = round(compile_s, 1)
        print(f"{label}: {ms:.1f} ms (first call {compile_s:.1f}s)",
              flush=True)

    if "--no-msm" not in sys.argv:
        from aes_zero_knowledge_proof_circuit_tpu.ops.msm_jax import (
            DevicePoints,
        )
        from aes_zero_knowledge_proof_circuit_tpu.ops.msm_pallas import (
            msm_pallas,
        )
        from aes_zero_knowledge_proof_circuit_tpu.utils.config import CONFIG
        from aes_zero_knowledge_proof_circuit_tpu.utils.serialize import (
            load_srs,
        )

        srs_path = CONFIG.srs_dir / "srs_bls377_v2_d1048576.npz"
        if srs_path.exists():
            srs = load_srs(str(srs_path))
            t0 = time.time()
            dp = DevicePoints(srs.powers_g1)
            out["srs_upload_s"] = round(time.time() - t0, 1)
            for lg in (18, 20):
                n = 1 << lg
                dig = jnp.asarray(
                    rng.integers(0, 1 << 16, size=(n, 16)).astype(np.uint32)
                )
                t0 = time.time()
                msm_pallas(dp.slice(0, n), dig)
                first = time.time() - t0
                t0 = time.time()
                msm_pallas(dp.slice(0, n), dig)
                warm = time.time() - t0
                out[f"msm_2pow{lg}_warm_s"] = round(warm, 2)
                out[f"msm_2pow{lg}_mpoints_per_s"] = round(n / warm / 1e6, 3)
                print(f"msm 2^{lg}: first {first:.1f}s warm {warm:.2f}s",
                      flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/microbench_tpu.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
