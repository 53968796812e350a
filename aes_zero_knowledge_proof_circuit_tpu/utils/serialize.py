"""Canonical (de)serialization for proofs, keys and SRS checkpoints.

Reference analogs: ark-serialize canonical bytes + the re-exported
`deserialize_proof` (src/lib.rs:52; SURVEY.md §2b ark-serialize row) and the
checkpoint/resume gap called out in SURVEY.md §5 ("SRS generation is the
expensive restartable step worth checkpointing").

Format (version-tagged):
    Fr        : 32 bytes LE (ark-canonical)
    G1 point  : 48 bytes, ark-serialize 0.3 compressed (x + SWFlags in the
                last byte) — see utils/ark_serialize.py
    G2 point  : 96 bytes, ark compressed (Fq2 x, flags in c1's last byte)
    lists     : u32 length prefix

v2 switched the point encodings to ark-canonical compressed (VERDICT round-1
item 7); the container structure (magic, version, field order) remains
self-defined — documented gap vs full ark-marlin Proof layout.
"""

from __future__ import annotations

import io
import struct
from typing import BinaryIO, List

import numpy as np

from ..marlin.indexer import MarlinVerifyingKey
from ..marlin.prover import MarlinProof
from ..ops import kzg
from ..ops.curve_host import AffinePoint, g1_infinity, g1_point
from . import ark_serialize as ark

MAGIC = b"ZKAESTPU"
VERSION = 2


# -- primitives -------------------------------------------------------------


def _w_fr(b: BinaryIO, v: int) -> None:
    b.write(ark.fr_to_bytes(v))


def _r_fr(b: BinaryIO) -> int:
    return ark.fr_from_bytes(b.read(32))


def _w_g1(b: BinaryIO, p: AffinePoint) -> None:
    b.write(ark.g1_compressed(p))


def _r_g1(b: BinaryIO) -> AffinePoint:
    return ark.g1_from_compressed(b.read(48))


def _w_g2(b: BinaryIO, p: AffinePoint) -> None:
    b.write(ark.g2_compressed(p))


def _r_g2(b: BinaryIO) -> AffinePoint:
    return ark.g2_from_compressed(b.read(96))


def _w_u32(b: BinaryIO, v: int) -> None:
    b.write(struct.pack("<I", v))


def _r_u32(b: BinaryIO) -> int:
    return struct.unpack("<I", b.read(4))[0]


# -- proof ------------------------------------------------------------------


def _ark_container_enabled() -> bool:
    import os

    return os.environ.get("ZKAES_PROOF_CONTAINER", "").lower() == "ark"


def serialize_proof(proof: MarlinProof) -> bytes:
    if _ark_container_enabled():
        from .ark_container import proof_to_ark_bytes

        return proof_to_ark_bytes(proof)
    b = io.BytesIO()
    b.write(MAGIC)
    _w_u32(b, VERSION)
    for c in (proof.comm_w, proof.comm_za, proof.comm_zb, proof.comm_s,
              proof.comm_t, proof.comm_g1, proof.comm_g1_shift, proof.comm_h1):
        _w_g1(b, c.point)
    _w_u32(b, len(proof.comm_g2))
    for i in range(len(proof.comm_g2)):
        _w_g1(b, proof.comm_g2[i].point)
        _w_g1(b, proof.comm_g2_shift[i].point)
        _w_g1(b, proof.comm_h2[i].point)
        _w_fr(b, proof.sigmas[i])
    _w_u32(b, len(proof.evals_beta1))
    for v in proof.evals_beta1:
        _w_fr(b, v)
    _w_u32(b, len(proof.evals_beta2))
    for row in proof.evals_beta2:
        _w_u32(b, len(row))
        for v in row:
            _w_fr(b, v)
    for op in (proof.open_beta1, proof.open_beta2):
        _w_g1(b, op.w)
        _w_fr(b, op.rand_eval)
    return b.getvalue()


def deserialize_proof(data: bytes) -> MarlinProof:
    """Reference API analog: simpleworks::marlin::serialization::
    deserialize_proof (re-export src/lib.rs:52)."""
    if data[:8] != MAGIC and (_ark_container_enabled() or data[:1] == b"\x03"):
        # ark-layout containers have no magic; their first 8 bytes are the
        # u64 LE round count (3 => first byte 0x03, which can never collide
        # with MAGIC's 'Z'). See utils/ark_container.py.
        from .ark_container import proof_from_ark_bytes

        return proof_from_ark_bytes(data)
    b = io.BytesIO(data)
    if b.read(8) != MAGIC:
        raise ValueError("bad magic")
    if _r_u32(b) != VERSION:
        raise ValueError("unsupported version")
    head = [kzg.Commitment(_r_g1(b)) for _ in range(8)]
    nm = _r_u32(b)
    comm_g2, comm_g2s, comm_h2, sigmas = [], [], [], []
    for _ in range(nm):
        comm_g2.append(kzg.Commitment(_r_g1(b)))
        comm_g2s.append(kzg.Commitment(_r_g1(b)))
        comm_h2.append(kzg.Commitment(_r_g1(b)))
        sigmas.append(_r_fr(b))
    evals_beta1 = [_r_fr(b) for _ in range(_r_u32(b))]
    evals_beta2 = []
    for _ in range(_r_u32(b)):
        evals_beta2.append([_r_fr(b) for _ in range(_r_u32(b))])
    opens = []
    for _ in range(2):
        w = _r_g1(b)
        re_ = _r_fr(b)
        opens.append(kzg.OpeningProof(w=w, rand_eval=re_))
    return MarlinProof(
        comm_w=head[0], comm_za=head[1], comm_zb=head[2], comm_s=head[3],
        comm_t=head[4], comm_g1=head[5], comm_g1_shift=head[6], comm_h1=head[7],
        comm_g2=comm_g2, comm_g2_shift=comm_g2s, comm_h2=comm_h2,
        sigmas=sigmas, evals_beta1=evals_beta1, evals_beta2=evals_beta2,
        open_beta1=opens[0], open_beta2=opens[1],
    )


# -- verifying key ----------------------------------------------------------


def serialize_vk(vk: MarlinVerifyingKey) -> bytes:
    b = io.BytesIO()
    b.write(MAGIC)
    _w_u32(b, VERSION)
    for v in (vk.log_n, vk.log_x, vk.num_instance, vk.max_degree):
        _w_u32(b, v)
    _w_u32(b, len(vk.log_ks))
    for v in vk.log_ks:
        _w_u32(b, v)
    _w_g1(b, vk.kzg_vk.g)
    _w_g1(b, vk.kzg_vk.gamma_g)
    _w_g2(b, vk.kzg_vk.h)
    _w_g2(b, vk.kzg_vk.tau_h)
    _w_u32(b, len(vk.index_comms))
    for c in vk.index_comms:
        _w_g1(b, c.point)
    return b.getvalue()


def deserialize_vk(data: bytes) -> MarlinVerifyingKey:
    b = io.BytesIO(data)
    if b.read(8) != MAGIC:
        raise ValueError("bad magic")
    if _r_u32(b) != VERSION:
        raise ValueError("unsupported version")
    log_n, log_x, num_instance, max_degree = (_r_u32(b) for _ in range(4))
    log_ks = [_r_u32(b) for _ in range(_r_u32(b))]
    g = _r_g1(b)
    gamma_g = _r_g1(b)
    h = _r_g2(b)
    tau_h = _r_g2(b)
    comms = [kzg.Commitment(_r_g1(b)) for _ in range(_r_u32(b))]
    return MarlinVerifyingKey(
        kzg_vk=kzg.VerifierKey(g=g, gamma_g=gamma_g, h=h, tau_h=tau_h,
                               max_degree=max_degree),
        log_n=log_n, log_x=log_x, num_instance=num_instance,
        log_ks=log_ks, max_degree=max_degree, index_comms=comms,
    )


# -- SRS checkpoint ---------------------------------------------------------


def save_srs(path: str, srs: kzg.SRS) -> None:
    """Checkpoint the SRS to disk as packed limb arrays (.npz)."""
    def pack(points) -> np.ndarray:
        packed = getattr(points, "packed", None)
        if packed is not None:  # PackedPowers: already in checkpoint layout
            return packed
        out = np.zeros((len(points), 2, 24), np.uint32)
        for i, p in enumerate(points):
            if p.inf:
                continue
            x, y = int(p.x), int(p.y)
            for j in range(24):
                out[i, 0, j] = (x >> (16 * j)) & 0xFFFF
                out[i, 1, j] = (y >> (16 * j)) & 0xFFFF
        return out

    np.savez_compressed(
        path,
        version=np.int64(VERSION),
        max_degree=np.int64(srs.max_degree),
        powers=pack(srs.powers_g1),
        gamma_powers=pack(srs.gamma_powers_g1),
        h=np.frombuffer(_g2_bytes(srs.h), np.uint8),
        tau_h=np.frombuffer(_g2_bytes(srs.tau_h), np.uint8),
    )


def _g2_bytes(p: AffinePoint) -> bytes:
    b = io.BytesIO()
    _w_g2(b, p)
    return b.getvalue()


def load_srs(path: str) -> kzg.SRS:
    d = np.load(path)
    if int(d["version"]) != VERSION:
        raise ValueError("unsupported SRS version")

    def unpack(arr: np.ndarray) -> List[AffinePoint]:
        out = []
        for i in range(arr.shape[0]):
            x = sum(int(arr[i, 0, j]) << (16 * j) for j in range(24))
            y = sum(int(arr[i, 1, j]) << (16 * j) for j in range(24))
            if x == 0 and y == 0:
                out.append(g1_infinity())
            else:
                out.append(g1_point(x, y))
        return out

    h = _r_g2(io.BytesIO(d["h"].tobytes()))
    tau_h = _r_g2(io.BytesIO(d["tau_h"].tobytes()))
    # big power tables stay packed (lazy AffinePoint view — avoids
    # materializing ~1M host bigint points at load time)
    from ..parallel.srs_gen import PackedPowers

    return kzg.SRS(
        max_degree=int(d["max_degree"]),
        powers_g1=PackedPowers(np.ascontiguousarray(d["powers"])),
        gamma_powers_g1=unpack(d["gamma_powers"]),
        h=h,
        tau_h=tau_h,
    )
