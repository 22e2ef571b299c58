"""Native C layer: SHAKE256 and batched hash-to-point must be bit-exact
with the pure-Python (hashlib) path."""

import hashlib

import numpy as np
import pytest

try:
    from falcon_r1cs_tpu.native import (
        native_hash_to_point_batch,
        native_shake256,
    )

    HAVE_NATIVE = True
except Exception:  # no compiler in env
    HAVE_NATIVE = False

from falcon_r1cs_tpu.falcon.hash_to_point import hash_to_point

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no C toolchain")


@pytest.mark.parametrize(
    "data", [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 137, b"w" * 5000]
)
def test_shake256_matches_hashlib(data):
    assert native_shake256(data, 200) == hashlib.shake_256(data).digest(200)


@pytest.mark.parametrize("n", [512, 1024])
def test_hash_to_point_batch_bit_exact(rng, n):
    msgs = [rng.bytes(int(rng.integers(0, 300))) for _ in range(8)]
    nonces = [rng.bytes(40) for _ in range(8)]
    got = native_hash_to_point_batch(msgs, nonces, n)
    want = np.stack([hash_to_point(m, nc, n) for m, nc in zip(msgs, nonces)])
    assert np.array_equal(got, want)


def test_hash_to_point_batch_validates_nonces(rng):
    with pytest.raises(ValueError):
        native_hash_to_point_batch([b"m", b"m"], [b"a" * 40, b"b" * 39], 512)


@pytest.mark.parametrize("n", [512, 1024])
def test_native_codecs_bit_exact(rng, n):
    from falcon_r1cs_tpu.falcon import (
        compress_signature,
        encode_public_key,
        make_instance,
    )
    from falcon_r1cs_tpu.native import (
        native_decode_pk_batch,
        native_decode_sig_batch,
    )
    from falcon_r1cs_tpu.params import get_params

    params = get_params(n)
    insts = [make_instance(rng, params) for _ in range(3)]
    pkb = [encode_public_key(i.h, params) for i in insts]
    sgb = [compress_signature(i.sig_signed, i.nonce, params) for i in insts]
    hs = native_decode_pk_batch(pkb, n)
    sigs, nonces = native_decode_sig_batch(sgb, n)
    for i, inst in enumerate(insts):
        assert np.array_equal(hs[i], inst.h)
        assert np.array_equal(sigs[i], inst.sig_signed)
        assert nonces[i] == inst.nonce


def test_native_codecs_reject_malformed():
    from falcon_r1cs_tpu.native import (
        native_decode_pk_batch,
        native_decode_sig_batch,
    )

    with pytest.raises(ValueError):
        native_decode_pk_batch([b"\x09" + b"\xff" * 896], 512)
    with pytest.raises(ValueError):
        native_decode_sig_batch([b"\x39" + b"\x00" * 40 + b"\x00" * 625], 512)
