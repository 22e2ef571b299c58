"""Pipeline-parallel NTT (parallel/pipeline_pp.py): bit-exactness of the
GPipe-style stage schedule against the single-device NTT, plus the
collective-count contrast with the DP comparator that justifies DP as
the production strategy (SURVEY §2.4 / VERDICT round-1 item 10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from falcon_r1cs_tpu.params import get_params
from falcon_r1cs_tpu.parallel import pipeline_pp


def _stage_mesh(n_dev):
    devs = np.asarray(jax.devices()[:n_dev])
    return Mesh(devs, ("stage",))


def _host_ntt(x, params):
    """Single-device oracle: all butterfly stages on one block."""
    table = jnp.asarray(np.asarray(params.ntt_table, dtype=np.int32))
    return np.asarray(
        jax.jit(
            lambda v: pipeline_pp._apply_stages(
                v, table, params.n, 0, params.log_n
            )
        )(jnp.asarray(x))
    )


@pytest.mark.parametrize("n_stages", [2, 4, 8])
def test_pp_ntt_bit_exact(n_stages):
    params = get_params(512)
    mesh = _stage_mesh(n_stages)
    rng = np.random.default_rng(7)
    T, mb = 4, 3
    x = rng.integers(0, params.q, size=(T * mb, params.n)).astype(np.int32)
    fn = pipeline_pp.pp_ntt(mesh, params, microbatch=mb, n_micro=T)
    got = np.asarray(fn(jnp.asarray(x)))
    want = _host_ntt(x, params)
    np.testing.assert_array_equal(got, want)


def test_pp_uneven_stage_groups():
    # log2(512) = 9 stages over 4 devices -> groups of 3/2/2/2
    assert pipeline_pp._stage_groups(9, 4) == [
        (0, 3), (3, 5), (5, 7), (7, 9)
    ]
    # every stage covered exactly once
    for log_n, s in [(9, 2), (10, 8), (10, 3)]:
        gs = pipeline_pp._stage_groups(log_n, s)
        covered = [l for (a, b) in gs for l in range(a, b)]
        assert covered == list(range(log_n))


def test_pp_has_collectives_dp_has_none():
    """The measured-justification contract: the PP schedule's compiled
    module contains a collective-permute (the conveyor) and a reduce
    (the output gather); the DP program on the same mesh contains NO
    collectives at all."""
    params = get_params(512)
    mesh = _stage_mesh(4)
    T, mb = 4, 2
    pp_inner = pipeline_pp._build_pp_ntt(mesh, params, "stage", mb, T)
    x = jnp.zeros((T, mb, params.n), jnp.int32)
    pp_hlo = pp_inner.lower(x).compile().as_text()
    assert "collective-permute" in pp_hlo

    dp = pipeline_pp.dp_ntt(mesh, params)
    xb = jnp.zeros((8, params.n), jnp.int32)
    dp_hlo = dp.lower(xb).compile().as_text()
    for coll in ("collective-permute", "all-reduce", "all-gather",
                 "all-to-all", "reduce-scatter"):
        assert coll not in dp_hlo, coll


def test_dp_comparator_bit_exact():
    params = get_params(512)
    mesh = _stage_mesh(8)
    rng = np.random.default_rng(3)
    x = rng.integers(0, params.q, size=(16, params.n)).astype(np.int32)
    got = np.asarray(pipeline_pp.dp_ntt(mesh, params)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, _host_ntt(x, params))
