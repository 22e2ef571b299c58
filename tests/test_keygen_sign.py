"""Real NTRU keygen + nearest-plane signing: end-to-end with the circuits
(the analog of the reference's circuit integration tests that call
falcon-rust keygen/sign, `falcon_ntt.rs:132-160`)."""

import numpy as np
import pytest

from falcon_r1cs_tpu import ConstraintSystem, FalconNTTVerificationCircuit, Q
from falcon_r1cs_tpu.falcon import (
    KeyPair,
    compress_signature,
    decompress_signature,
    instance_from_signature,
    ntru_solve,
    ntt,
)
from falcon_r1cs_tpu.falcon.keygen import poly_mul
from falcon_r1cs_tpu.params import FALCON_512


@pytest.fixture(scope="module")
def keypair():
    return KeyPair.generate(np.random.default_rng(42), FALCON_512)


def test_ntru_equation(keypair):
    sk = keypair.secret_key
    chk = [
        a - b for a, b in zip(poly_mul(sk.f, sk.G), poly_mul(sk.g, sk.F))
    ]
    assert chk[0] == Q and not any(chk[1:])


def test_public_key_relation(keypair):
    sk = keypair.secret_key
    lhs = ntt(keypair.h) * ntt(np.asarray(sk.f) % Q) % Q
    assert np.array_equal(lhs, ntt(np.asarray(sk.g) % Q))


def test_sign_verify_deterministic(keypair):
    msg = b"testing message"
    sig = keypair.signer.sign_with_seed(b"test seed", msg)
    assert keypair.verify(msg, sig)
    sig2 = keypair.signer.sign_with_seed(b"test seed", msg)
    assert np.array_equal(sig.s2, sig2.s2) and sig.nonce == sig2.nonce
    assert not keypair.verify(b"tampered", sig)


def test_signature_codec_roundtrip(keypair):
    sig = keypair.signer.sign_with_seed(b"seed", b"msg")
    data = compress_signature(sig.s2, sig.nonce, FALCON_512)
    s2, nonce, params = decompress_signature(data)
    assert np.array_equal(s2, sig.s2) and nonce == sig.nonce


def test_real_signature_through_circuit(keypair):
    """The reference's integration test shape: real keygen, deterministic
    signing, clear verification, then synthesize + is_satisfied."""
    msg = b"testing message"
    sig = keypair.signer.sign_with_seed(b"test seed", msg)
    inst = instance_from_signature(
        keypair.h, msg, sig.nonce, sig.s2, FALCON_512
    )
    cs = ConstraintSystem()
    FalconNTTVerificationCircuit.build_circuit(inst).generate_constraints(cs)
    assert (cs.num_instance_variables, cs.num_witness_variables,
            cs.num_constraints) == (1025, 78386, 81460)
    assert cs.is_satisfied()


def test_klein_randomized_signing(keypair):
    """Randomized Klein-GPV mode: distribution-matching ffSampling.
    Norms concentrate near 2n*sigma^2 (~28.1M for n=512), distinct draws
    give distinct valid signatures."""
    rng = np.random.default_rng(5)
    sigs = [
        keypair.signer.sign(b"m", bytes([i]) * 40, rng=rng) for i in range(3)
    ]
    for s in sigs:
        assert keypair.verify(b"m", s)
    norms = [int(np.sum(s.s2.astype(np.int64) ** 2)) for s in sigs]
    # s2 carries about half the total norm; total stays under beta^2
    assert all(5_000_000 < nm < 25_000_000 for nm in norms), norms
    a = keypair.signer.sign(b"m", bytes(40), rng=np.random.default_rng(1))
    b = keypair.signer.sign(b"m", bytes(40), rng=np.random.default_rng(2))
    assert not np.array_equal(a.s2, b.s2)
