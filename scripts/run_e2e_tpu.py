#!/usr/bin/env python
"""Full 16-byte AES-128 prove/verify on the real TPU chip.

Exercises the whole stack end-to-end (SURVEY.md §7 "minimum end-to-end
slice"): template (cached) -> device SRS generation (checkpointed) -> device
indexing -> JAX prover -> host verifier, plus the tampered-ciphertext
negative case (tests/integration parity with the reference's
test_encrypt_a_16_bytes_plaintext, tests/integration_tests.rs:312-337).

Run:  python scripts/run_e2e_tpu.py [msg_len]
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("e2e")


def main() -> None:
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> -> stack dump
    faulthandler.dump_traceback_later(600, repeat=True)  # periodic heartbeat
    msg_len = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax

    log.info("devices: %s", jax.devices())

    from aes_zero_knowledge_proof_circuit_tpu import api

    t0 = time.time()
    pk, vk = api.synthesize_keys(msg_len, backend="jax")
    log.info("synthesize_keys: %.1fs", time.time() - t0)

    msg = bytes(range(msg_len))
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")

    t0 = time.time()
    proof = api.encrypt(msg, key, pk)
    log.info("encrypt (first, incl. compiles): %.1fs", time.time() - t0)

    # verify/tamper/serialize BEFORE the warm re-prove so a late failure
    # cannot erase the proof evidence (the warm 64B prove OOMed once
    # after a completed first proof, artifacts/e2e_64B_r5c.log)
    ct = api.compute_ciphertext(msg, key)
    t0 = time.time()
    ok = api.verify_encryption(vk, proof, ct)
    log.info("verify: %s in %.1fs", ok, time.time() - t0)
    assert ok, "proof did not verify"

    bad = bytearray(ct)
    bad[0] ^= 1
    assert not api.verify_encryption(vk, proof, bytes(bad)), (
        "tampered ciphertext must not verify"
    )
    log.info("tampered ciphertext correctly rejected")

    from aes_zero_knowledge_proof_circuit_tpu.utils.serialize import (
        deserialize_proof,
        serialize_proof,
    )

    blob = serialize_proof(proof)
    log.info("proof size: %d bytes", len(blob))
    assert api.verify_encryption(vk, deserialize_proof(blob), ct)
    log.info("serialization round-trip verified — E2E COMPLETE")

    if os.environ.get("ZKAES_E2E_WARM", "1") != "0":
        t0 = time.time()
        proof = api.encrypt(msg, key, pk)
        log.info("encrypt (warm): %.1fs", time.time() - t0)
        assert api.verify_encryption(vk, proof, ct)
        log.info("warm proof verified")


if __name__ == "__main__":
    main()
