"""Distributional validation of the discrete-Gaussian samplers
(falcon/sampler.py) — the statistical tests VERDICT round 1 asked for.

Chi-square goodness of fit against the exact target pmf (computed from the
same high-precision CDT machinery, which is itself checked against direct
rho sums), with fixed seeds and generous thresholds (~p < 1e-6) so the
tests are deterministic and non-flaky.
"""

import math

import numpy as np
import pytest

from falcon_r1cs_tpu.falcon.sampler import (
    _SIGMA0,
    _cdt,
    sample_dgauss,
    sample_fg_spec,
    sample_z_ccs,
)
from falcon_r1cs_tpu.params import Q

rng = np.random.default_rng(20260817)


def _pmf(sigma: float, center: float = 0.0, tail: float = 19.0):
    t = int(math.ceil(tail * sigma + abs(center))) + 1
    zs = np.arange(-t, t + 1)
    w = np.exp(-((zs - center) ** 2) / (2 * sigma * sigma))
    return zs, w / w.sum()


def _chi_square(samples, zs, probs, min_expected=8.0):
    n = len(samples)
    counts = {int(z): 0 for z in zs}
    for s in samples:
        counts[int(s)] = counts.get(int(s), 0) + 1
    stat = 0.0
    df = 0
    tail_obs = 0
    tail_exp = 0.0
    for z, p in zip(zs, probs):
        exp = n * p
        if exp < min_expected:
            tail_obs += counts.pop(int(z), 0)
            tail_exp += exp
            continue
        obs = counts.pop(int(z), 0)
        stat += (obs - exp) ** 2 / exp
        df += 1
    # anything sampled outside the binned support joins the tail bucket
    tail_obs += sum(counts.values())
    if tail_exp > 0:
        stat += (tail_obs - tail_exp) ** 2 / tail_exp
        df += 1
    df -= 1
    # loose critical value ~ df + 5 sqrt(2 df): far beyond p=1e-6
    return stat, df, df + 5.0 * math.sqrt(2.0 * df)


def test_cdt_matches_direct_rho_sum():
    sigma = 2.87
    lo, cum = _cdt(sigma)
    probs = np.diff(np.concatenate([[0], cum.astype(np.float64)]))
    probs /= probs.sum()
    zs = np.arange(lo, lo + len(cum))
    w = np.exp(-(zs.astype(np.float64) ** 2) / (2 * sigma * sigma))
    w /= w.sum()
    assert np.max(np.abs(probs - w)) < 1e-12


def test_sample_dgauss_distribution():
    sigma = 1.17 * math.sqrt(Q / (1 << 11))  # the keygen base sigma
    samples = sample_dgauss(rng, sigma, size=60000)
    zs, probs = _pmf(sigma)
    stat, df, crit = _chi_square(samples, zs, probs)
    assert stat < crit, (stat, df, crit)
    assert abs(np.mean(samples)) < 5 * sigma / math.sqrt(60000)
    assert abs(np.std(samples) / sigma - 1) < 0.02


@pytest.mark.parametrize(
    "center,sigma",
    [(0.0, 1.5), (0.3, 1.3), (-2.7, 1.8), (10.5, 2.0)],
)
def test_sample_z_ccs_distribution(center, sigma):
    samples = np.asarray(
        [sample_z_ccs(rng, center, sigma) for _ in range(20000)]
    )
    zs, probs = _pmf(sigma, center)
    stat, df, crit = _chi_square(samples, zs, probs)
    assert stat < crit, (stat, df, crit)
    assert abs(np.mean(samples) - center) < 6 * sigma / math.sqrt(20000)


def test_sample_z_ccs_rejects_oversized_sigma():
    with pytest.raises(ValueError, match="sigma"):
        sample_z_ccs(rng, 0.0, _SIGMA0 + 0.5)


def test_sample_fg_spec_variance_and_parity():
    # n=512 sums two base draws per coefficient: the marginal is the
    # 2-fold convolution; check mean/variance and that n=1024 uses the
    # base distribution directly
    for n in (512, 1024):
        k = 1 << (10 - (n.bit_length() - 1))
        target_var = (1.17**2) * Q / (2 * n)
        draws = np.concatenate(
            [sample_fg_spec(rng, n) for _ in range(40)]
        ).astype(np.float64)
        assert abs(draws.var() / target_var - 1) < 0.05, (n, draws.var())
        assert abs(draws.mean()) < 5 * math.sqrt(target_var / len(draws))
        assert k * (1.17**2) * Q / (1 << 11) == pytest.approx(target_var)


def test_klein_signing_still_works_with_new_sampler():
    """End-to-end: Klein-GPV signing at the spec sigma with the O(1)
    sampler produces verifying signatures."""
    from falcon_r1cs_tpu.falcon import KeyPair
    from falcon_r1cs_tpu.params import FALCON_512

    kp = KeyPair.generate(np.random.default_rng(11), FALCON_512)
    r = np.random.default_rng(12)
    sig1 = kp.signer.sign(b"msg", bytes(40), rng=r)
    sig2 = kp.signer.sign(b"msg", bytes(40), rng=r)
    assert kp.verify(b"msg", sig1) and kp.verify(b"msg", sig2)
    assert not np.array_equal(sig1.s2, sig2.s2)  # randomized
