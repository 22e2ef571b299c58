"""Pallas fused limb-NTT kernel: correctness in interpreter mode (the CPU
test environment has no Mosaic backend; TPU execution is exercised by
bench/verify runs)."""

import jax
import numpy as np
import pytest
from jax.experimental import pallas as pl

import falcon_r1cs_tpu.ops.pallas_ntt as pn
from falcon_r1cs_tpu.ops.ntt_limb import ntt_with_hints
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024, Q


@pytest.fixture()
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
    )
    pn._build.cache_clear()
    yield
    pn._build.cache_clear()


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_pallas_matches_xla(rng, interpret_mode, params):
    x = rng.integers(0, Q, size=(8, params.n)).astype(np.int32)
    t_ref, b_ref = jax.jit(lambda x: ntt_with_hints(x, params))(x)
    t_pl, b_pl = pn.ntt_with_hints_pallas(x, params, block=4)
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_pl))
    assert np.array_equal(np.asarray(b_ref), np.asarray(b_pl))
