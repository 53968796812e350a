"""Typed error tier (reference src/helpers/traits.rs:4-20: every API misuse
surfaces as a typed error, not a panic/bare assert)."""

import pytest

import aes_zero_knowledge_proof_circuit_tpu as zk
from aes_zero_knowledge_proof_circuit_tpu.utils.errors import (
    InvalidInputError,
    ZkAesError,
    require,
)


def test_require_raises_typed():
    with pytest.raises(InvalidInputError):
        require(False, InvalidInputError, "nope")
    require(True, InvalidInputError, "fine")


def test_invalid_input_is_value_error_and_zkaes_error():
    err = InvalidInputError("x")
    assert isinstance(err, ValueError)
    assert isinstance(err, ZkAesError)


def test_synthesize_keys_rejects_bad_lengths():
    from aes_zero_knowledge_proof_circuit_tpu import api

    with pytest.raises(InvalidInputError):
        api.synthesize_keys(15)
    with pytest.raises(InvalidInputError):
        api.synthesize_keys(0)
    with pytest.raises(InvalidInputError):
        api.synthesize_keys(16, mode="ctr")


def test_verify_rejects_bad_ciphertext_shape():
    from aes_zero_knowledge_proof_circuit_tpu import api

    with pytest.raises(InvalidInputError):
        api.verify_encryption(None, None, b"short")
    with pytest.raises(InvalidInputError):
        api.verify_encryption(None, None, b"\0" * 16, iv=b"\0" * 4)


def test_errors_exported_at_package_root():
    assert zk.InvalidInputError is InvalidInputError
    assert issubclass(zk.SynthesisError, zk.ZkAesError)
