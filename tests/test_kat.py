"""Known-answer tests for the crypto layer.

The reference inherits bit-exactness from falcon-rust's FFI into the
Falcon reference C (`/root/reference/falcon-r1cs/src/circuits/falcon_ntt.rs:133-141`).
No Falcon C or official Falcon KAT files exist in this offline image, so
external validation is layered:

1. Keccak core (the only primitive with official vectors available):
   pinned NIST FIPS-202 known-answer values, asserted against BOTH our
   from-scratch C implementation (native/falcon_native.c) and OpenSSL
   (hashlib) — three independent sources must agree byte-for-byte.
2. Multi-block absorb paths: OpenSSL as the external oracle over many
   lengths (covers the sponge padding/rate logic beyond the one-block
   KATs).
3. hash-to-point: the rejection-sampling loop is spec-derived (Falcon
   spec 3.7.1); its output on fixed inputs is pinned as a regression
   golden and cross-checked Python-vs-C.

If any byte here drifts, the crypto layer is broken — these are the
tests the VERDICT's "self-consistent only" caveat asked for, to the
extent possible with zero network egress.
"""

import hashlib

import numpy as np
import pytest

try:
    from falcon_r1cs_tpu.native import native_hash_to_point_batch, native_shake256

    _HAVE_NATIVE = True
except Exception:  # pragma: no cover - no compiler
    _HAVE_NATIVE = False

requires_native = pytest.mark.skipif(not _HAVE_NATIVE, reason="no native lib")

# --- official NIST FIPS-202 known-answer values ---------------------------
# SHAKE256(""), first 64 bytes (NIST FIPS-202 example vectors)
SHAKE256_EMPTY_64 = bytes.fromhex(
    "46b9dd2b0ba88d13233b3feb743eeb243fcd52ea62b81b82b50c27646ed5762f"
    "d75dc4ddd8c0f200cb05019d67b592f6fc821c49479ab48640292eacb3b7c4be"
)
# SHA3-256("") and SHA3-256("abc") (FIPS-202 / NIST CAVP)
SHA3_256_EMPTY = bytes.fromhex(
    "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
)
SHA3_256_ABC = bytes.fromhex(
    "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"
)
# SHAKE128(""), first 32 bytes
SHAKE128_EMPTY_32 = bytes.fromhex(
    "7f9c2ba4e88f827d616045507605853ed73b8093f6efbc88eb1a6eacfa66ef26"
)


def test_openssl_matches_nist_kats():
    """hashlib (OpenSSL) reproduces the pinned official vectors — guards
    against a corrupted pin and establishes hashlib as a valid oracle."""
    assert hashlib.shake_256(b"").digest(64) == SHAKE256_EMPTY_64
    assert hashlib.sha3_256(b"").digest() == SHA3_256_EMPTY
    assert hashlib.sha3_256(b"abc").digest() == SHA3_256_ABC
    assert hashlib.shake_128(b"").digest(32) == SHAKE128_EMPTY_32


@requires_native
def test_native_shake256_matches_nist_kat():
    """Our from-scratch FIPS-202 C implementation reproduces the official
    SHAKE256 empty-message vector."""
    assert native_shake256(b"", 64) == SHAKE256_EMPTY_64


@requires_native
def test_native_shake256_multiblock_against_openssl():
    """Sponge rate/padding logic across block boundaries vs the external
    OpenSSL oracle: lengths straddling the 136-byte SHAKE256 rate."""
    for n in (0, 1, 3, 135, 136, 137, 200, 271, 272, 273, 1000):
        msg = bytes((i * 7 + n) & 0xFF for i in range(n))
        for outlen in (1, 32, 136, 137, 500):
            assert native_shake256(msg, outlen) == hashlib.shake_256(
                msg
            ).digest(outlen), (n, outlen)


# --- hash-to-point regression goldens ------------------------------------
# Falcon spec 3.7.1 HashToPoint on fixed inputs; first 16 coefficients for
# n=512.  Derived from the spec procedure over the KAT-validated SHAKE256
# stream (msg=b"falcon-r1cs-tpu kat", nonce=40 x 0x01); pinned so any
# drift in the rejection loop, stream order, or reduction is caught.
H2P_MSG = b"falcon-r1cs-tpu kat"
H2P_NONCE = bytes([1] * 40)
H2P_FIRST16_N512 = [
    10631, 6765, 233, 2776, 8321, 253, 8088, 12267,
    572, 6112, 4532, 8830, 1886, 1111, 3286, 2465,
]


def _h2p_spec_oracle(msg: bytes, nonce: bytes, n: int) -> list[int]:
    """Direct transcription of Falcon spec 3.7.1 over hashlib SHAKE256."""
    out = []
    budget = 2 * n * 2
    while True:
        stream = hashlib.shake_256(nonce + msg).digest(budget)
        out = []
        k = 61445  # 5 * 12289
        for i in range(0, len(stream), 2):
            if len(out) == n:
                return out
            t = (stream[i] << 8) | stream[i + 1]
            if t < k:
                out.append(t % 12289)
        budget *= 2  # stream exhausted before n accepts: widen and retry


def test_h2p_spec_oracle_matches_pinned_golden():
    got = _h2p_spec_oracle(H2P_MSG, H2P_NONCE, 512)
    assert got[:16] == H2P_FIRST16_N512


def test_python_hash_to_point_matches_spec_oracle():
    from falcon_r1cs_tpu.falcon.hash_to_point import hash_to_point

    for n in (512, 1024):
        got = hash_to_point(H2P_MSG, H2P_NONCE, n)
        assert list(got) == _h2p_spec_oracle(H2P_MSG, H2P_NONCE, n)


@requires_native
def test_native_hash_to_point_matches_spec_oracle():
    for n in (512, 1024):
        got = native_hash_to_point_batch([H2P_MSG], [H2P_NONCE], n)
        assert got.shape == (1, n)
        assert list(got[0]) == _h2p_spec_oracle(H2P_MSG, H2P_NONCE, n)
