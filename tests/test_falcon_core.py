"""Differential tests for the clear-side Falcon layer (SURVEY.md section 4
item 2: the model is circuit-vs-clear and clear-vs-spec checking)."""

import hashlib

import numpy as np
import pytest

from falcon_r1cs_tpu.falcon import (
    DualPolynomial,
    Polynomial,
    compress_signature,
    decode_public_key,
    decompress_signature,
    encode_public_key,
    hash_to_point,
    intt,
    make_instance,
    negacyclic_mul,
    ntt,
    ntt_jax,
    verify,
)
from falcon_r1cs_tpu.falcon.codec import CodecError
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024, Q


@pytest.mark.parametrize("n", [512, 1024])
def test_ntt_roundtrip(rng, n):
    a = rng.integers(0, Q, size=(3, n))
    assert np.array_equal(intt(ntt(a)), a)


@pytest.mark.parametrize("n", [512, 1024])
def test_convolution_theorem(rng, n):
    a = rng.integers(0, Q, size=n)
    b = rng.integers(0, Q, size=n)
    # schoolbook negacyclic reference
    ref = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                ref[k] += int(a[i]) * int(b[j])
            else:
                ref[k - n] -= int(a[i]) * int(b[j])
    ref = np.array([int(x) % Q for x in ref], dtype=np.int64)
    assert np.array_equal(negacyclic_mul(a, b), ref)


def test_ntt_jax_matches_numpy(rng):
    import jax.numpy as jnp

    a = rng.integers(0, Q, size=(4, 512))
    got = np.asarray(ntt_jax(jnp.asarray(a), 512))
    assert np.array_equal(got, ntt(a))


def test_hash_to_point_deterministic():
    nonce = bytes(range(40))
    h1 = hash_to_point(b"msg", nonce, 512)
    h2 = hash_to_point(b"msg", nonce, 512)
    assert np.array_equal(h1, h2)
    assert h1.min() >= 0 and h1.max() < Q
    assert not np.array_equal(h1, hash_to_point(b"msg2", nonce, 512))


def test_hash_to_point_rejection_semantics():
    """First accepted 16-bit BE chunk < 5q of shake256(nonce||msg) must be
    coefficient 0 (spec HashToPoint)."""
    nonce = b"\x01" * 40
    msg = b"abc"
    stream = hashlib.shake_256(nonce + msg).digest(4096)
    coeffs = []
    for i in range(0, len(stream), 2):
        t = (stream[i] << 8) | stream[i + 1]
        if t < 5 * Q:
            coeffs.append(t % Q)
        if len(coeffs) == 8:
            break
    got = hash_to_point(msg, nonce, 512)
    assert list(got[:8]) == coeffs


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_pk_codec_roundtrip(rng, params):
    h = rng.integers(0, Q, size=params.n)
    data = encode_public_key(h, params)
    assert len(data) == params.pk_bytes
    h2, p2 = decode_public_key(data)
    assert p2 is params
    assert np.array_equal(h, h2)


def test_pk_codec_rejects_garbage():
    with pytest.raises(CodecError):
        decode_public_key(b"")
    with pytest.raises(CodecError):
        decode_public_key(b"\x07" + b"\x00" * 896)


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_sig_codec_roundtrip(rng, params):
    s = np.rint(rng.normal(0, 160, size=params.n)).astype(np.int64)
    nonce = rng.bytes(40)
    data = compress_signature(s, nonce, params)
    assert len(data) == params.sig_bytes
    s2, nonce2, p2 = decompress_signature(data)
    assert p2 is params
    assert nonce2 == nonce
    assert np.array_equal(s, s2)


def test_dual_polynomial_split(rng):
    p = Polynomial(rng.integers(0, Q, size=512))
    d = DualPolynomial.from_polynomial(p)
    # disjoint support
    assert np.all((d.pos.coeffs == 0) | (d.neg.coeffs == 0))
    # recombine: pos - neg == centered rep mod q
    assert np.array_equal((d.pos.coeffs - d.neg.coeffs) % Q, p.coeffs)


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_instance_verifies(rng, params):
    inst = make_instance(rng, params)
    assert verify(inst.h, inst.msg, inst.nonce, inst.sig_signed, params)
    assert inst.l2_norm_sq() < params.sig_l2_bound
    # v = hm - sig*h holds
    v = (inst.hm - negacyclic_mul(inst.sig_lifted, inst.h)) % Q
    assert np.array_equal(v, inst.v_lifted)
    # tampered signature must fail
    bad = inst.sig_signed.copy()
    bad[0] += 3000
    assert not verify(inst.h, inst.msg, inst.nonce, bad, params)


def test_verify_batch_matches_scalar():
    """Batched device verification == per-signature host verification,
    including rejects (tampered message and oversized signature)."""
    import numpy as np

    from falcon_r1cs_tpu.falcon import make_instance, verify, verify_batch
    from falcon_r1cs_tpu.params import FALCON_512

    rng = np.random.default_rng(9)
    insts = [make_instance(rng, FALCON_512, msg=b"vb %d" % i) for i in range(4)]
    h = np.stack([i.h for i in insts])
    s2 = np.stack([i.sig_signed for i in insts])
    msgs = [i.msg for i in insts]
    nonces = [i.nonce for i in insts]
    # corrupt one message and blow up one signature's norm
    msgs[1] = b"tampered"
    s2[2] = 4000
    got = verify_batch(h, msgs, nonces, s2, FALCON_512)
    exp = [
        verify(h[i], msgs[i], nonces[i], s2[i], FALCON_512) for i in range(4)
    ]
    assert got.tolist() == exp
    assert exp == [True, False, False, True]
