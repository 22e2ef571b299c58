"""ffSampling signer: FFT-domain algebra, LDL-tree/QR equivalence, and
the sampled-signature distribution (the capability the reference gets
from falcon-rust's FFI into the Falcon C ffSampling signer,
`/root/reference/falcon-r1cs/src/circuits/falcon_ntt.rs:133-141`)."""

import numpy as np
import pytest

from falcon_r1cs_tpu.falcon import KeyPair
from falcon_r1cs_tpu.falcon import ffsampling as ffs
from falcon_r1cs_tpu.falcon.ffsampling import tree_leaf_sigmas
from falcon_r1cs_tpu.params import FALCON_512


@pytest.fixture(scope="module")
def keypair():
    return KeyPair.generate(np.random.default_rng(42), FALCON_512)


def _negacyclic(f, g):
    n = len(f)
    out = np.zeros(n)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] += f[i] * g[j]
            else:
                out[k - n] -= f[i] * g[j]
    return out


@pytest.mark.parametrize("n", [2, 8, 64, 512])
def test_fft_roundtrip_and_negacyclic_product(n):
    rng = np.random.default_rng(n)
    f = rng.integers(-50, 50, n).astype(float)
    g = rng.integers(-50, 50, n).astype(float)
    F, G = ffs.fft(f), ffs.fft(g)
    back = ffs.ifft(F)
    assert np.allclose(back.real, f, atol=1e-8)
    assert np.allclose(back.imag, 0, atol=1e-8)
    if n <= 64:  # O(n^2) oracle
        assert np.allclose(ffs.ifft(F * G).real, _negacyclic(f, g), atol=1e-6)
    F0, F1 = ffs.split_fft(F)
    assert np.allclose(ffs.merge_fft(F0, F1), F)
    # split semantics: f(x) = f0(x^2) + x f1(x^2)
    assert np.allclose(ffs.ifft(F0).real, f[0::2], atol=1e-8)
    assert np.allclose(ffs.ifft(F1).real, f[1::2], atol=1e-8)


def test_root_table_pairing_invariant():
    for n in (2, 8, 256):
        r = ffs._roots(n)
        assert np.allclose(r[0::2] ** 2, ffs._roots(n // 2))
        assert np.allclose(r[1::2], -r[0::2])
        assert np.allclose(r ** n, -1.0)  # all are roots of x^n + 1


def test_ffldl_top_level_identity(keypair):
    """First LDL level reconstructs the Gram: g01 = conj(l) d00,
    g11 = d11 + l conj(l) d00."""
    ff = keypair.signer._ensure_ff()
    sk = keypair.secret_key
    fh, gh = ffs.fft(np.asarray(sk.f, float)), ffs.fft(np.asarray(sk.g, float))
    Fh, Gh = ffs.fft(np.asarray(sk.F, float)), ffs.fft(np.asarray(sk.G, float))
    g00 = (gh * np.conj(gh) + fh * np.conj(fh)).real
    g01 = gh * np.conj(Gh) + fh * np.conj(Fh)
    l = ff.tree.l
    assert np.allclose(np.conj(l) * g00, g01, rtol=1e-9)
    # det(Gram) = q^2 pointwise  ->  d11 = q^2 / g00
    g11 = (Gh * np.conj(Gh) + Fh * np.conj(Fh)).real
    d11 = g11 - (l * np.conj(l)).real * g00
    assert np.allclose(d11 * g00, float(ffs.Q) ** 2, rtol=1e-6)


def test_leaf_sigma_invariants_vs_qr(keypair):
    """The tree's 2n leaves are sigma/||b*_i|| for the Gram-Schmidt of the
    basis in the FFT-tree's vector ordering.  Individual norms depend on
    the ordering (so they differ elementwise from the QR row-order GS),
    but the determinant invariant prod ||b*_i||^2 = det(Gram) = q^2n and
    the SamplerZ operating window must hold for both."""
    signer = keypair.signer
    ff = signer._ensure_ff()
    signer._ensure_qr()
    sigma = signer._SIGMA[512]
    leaf = np.sort(tree_leaf_sigmas(ff.tree))
    qr = np.sort(sigma / np.abs(np.diag(signer.r_mat)))
    assert leaf.shape == qr.shape == (1024,)
    # prod (sigma/s')^2 = q^2n, for both orderings
    logq = float(np.log(float(ffs.Q)))
    for s in (leaf, qr):
        logdet = float(np.sum(2.0 * (np.log(sigma) - np.log(s))))
        assert abs(logdet - 1024 * logq) < 1e-6 * 1024 * logq
    assert leaf.max() <= ffs._SIGMA0 + 1e-9
    # same GS *quality* window (ends agree to a couple of percent)
    assert abs(leaf[0] - qr[0]) / qr[0] < 0.02
    assert abs(leaf[-1] - qr[-1]) / qr[-1] < 0.02


def test_ff_sign_verifies_and_is_seeded_deterministic(keypair):
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    sig1 = keypair.signer.sign(b"msg", bytes(40), rng=rng1)
    sig2 = keypair.signer.sign(b"msg", bytes(40), rng=rng2)
    assert np.array_equal(sig1.s2, sig2.s2)
    assert keypair.verify(b"msg", sig1)
    assert not keypair.verify(b"other", sig1)
    # distinct randomness -> distinct signatures
    sig3 = keypair.signer.sign(b"msg", bytes(40), rng=rng1)
    assert not np.array_equal(sig1.s2, sig3.s2)


def test_ff_distribution_matches_spec_and_klein(keypair):
    """E[||s||^2] for GPV samples is ~ 2n sigma^2; ffSampling and the
    QR Klein engine (same distribution, different algorithm) must agree."""
    rng = np.random.default_rng(11)
    n, sigma = 512, keypair.signer._SIGMA[512]
    k = 24
    ff_norms, kl_norms = [], []
    for i in range(k):
        msg = b"dist%d" % i
        ff = keypair.signer.sign(msg, bytes(40), rng=rng)
        ff_norms.append(_sig_normsq(keypair, msg, ff))
        kl = keypair.signer.sign(msg, bytes(40), rng=rng, sampler="klein")
        kl_norms.append(_sig_normsq(keypair, msg, kl))
    expect = 2 * n * sigma * sigma
    ff_mean, kl_mean = np.mean(ff_norms), np.mean(kl_norms)
    # std of the mean of chi^2-ish norms at k=24 is ~6%; allow 4 sigma
    assert abs(ff_mean - expect) / expect < 0.25, (ff_mean, expect)
    assert abs(kl_mean - expect) / expect < 0.25, (kl_mean, expect)
    assert abs(ff_mean - kl_mean) / expect < 0.35


def _sig_normsq(keypair, msg, sig):
    from falcon_r1cs_tpu.falcon.hash_to_point import hash_to_point
    from falcon_r1cs_tpu.falcon.ntt import intt, ntt
    from falcon_r1cs_tpu.params import Q

    n = 512
    hm = hash_to_point(msg, sig.nonce, n)
    s2 = np.asarray(sig.s2, np.int64)
    h_ntt = ntt(np.asarray(keypair.h) % Q)
    s1 = (hm - intt(ntt(s2 % Q) * h_ntt % Q)) % Q
    s1 = np.where(s1 > Q // 2, s1 - Q, s1)
    return float(np.sum(s1 * s1) + np.sum(s2 * s2))
