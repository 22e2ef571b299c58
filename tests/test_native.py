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
