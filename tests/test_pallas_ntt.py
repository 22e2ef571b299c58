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
    pn._build_vchain.cache_clear()
    yield
    pn._build.cache_clear()
    pn._build_vchain.cache_clear()


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_pallas_matches_xla(rng, interpret_mode, params):
    x = rng.integers(0, Q, size=(8, params.n)).astype(np.int32)
    t_ref, b_ref = jax.jit(lambda x: ntt_with_hints(x, params))(x)
    t_pl, b_pl = pn.ntt_with_hints_pallas(x, params, block=4)
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_pl))
    assert np.array_equal(np.asarray(b_ref), np.asarray(b_pl))


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_pallas_vchain_matches_xla(rng, interpret_mode, params):
    """Fused INTT-prologue v-chain kernel vs the composed XLA path
    (intt_jax then ntt_with_hints): t/b/v all bit-equal."""
    from falcon_r1cs_tpu.falcon.ntt import intt_jax

    w = rng.integers(0, Q, size=(8, params.n)).astype(np.int32)
    v_ref = jax.jit(lambda w: intt_jax(w, params.n))(w)
    t_ref, b_ref = jax.jit(lambda x: ntt_with_hints(x, params))(v_ref)
    t_pl, b_pl, v_pl = pn.intt_ntt_hints_pallas(w, params, block=4)
    assert np.array_equal(np.asarray(v_ref), np.asarray(v_pl))
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_pl))
    assert np.array_equal(np.asarray(b_ref), np.asarray(b_pl))


@pytest.mark.parametrize("params", [FALCON_512])
def test_pallas_v3_matches_xla(rng, params):
    """v3 (whole-tensor semi-carry) kernel, interpreter mode.  On the real
    TPU the remote Mosaic compiler currently OOMs on this kernel; the XLA
    path remains the production default.  The kernel lives under tools/
    (experiment, not shipped in the package — see ENGINEERING.md)."""
    import importlib.util
    import pathlib

    v3_path = pathlib.Path(__file__).parents[1] / "tools" / "pallas_ntt_v3.py"
    spec = importlib.util.spec_from_file_location("pallas_ntt_v3", v3_path)
    v3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(v3)

    orig = pl.pallas_call
    pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
    v3._build.cache_clear()
    try:
        x = rng.integers(0, Q, size=(8, params.n)).astype(np.int32)
        t_ref, b_ref = jax.jit(lambda x: ntt_with_hints(x, params))(x)
        t_pl, b_pl = v3.ntt_with_hints_pallas_v3(x, params, block=4)
        assert np.array_equal(np.asarray(t_ref), np.asarray(t_pl))
        assert np.array_equal(np.asarray(b_ref), np.asarray(b_pl))
    finally:
        pl.pallas_call = orig
        v3._build.cache_clear()
