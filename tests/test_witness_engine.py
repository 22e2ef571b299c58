"""Batched witness engine parity: every device-generated witness value must
equal the host trace bit-exactly (BASELINE.md: "witness values must match
the arkworks reference bit-exactly")."""

import numpy as np
import pytest

from falcon_r1cs_tpu import ConstraintSystem, FalconNTTVerificationCircuit
from falcon_r1cs_tpu.falcon import make_instance, ntt
from falcon_r1cs_tpu.ops.limbs import (
    ints_to_limbs,
    limbs_to_ints,
)
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024, Q
from falcon_r1cs_tpu.witness import (
    interleave_witness,
    jitted_engine,
    num_witness,
)


def _engine_matrix(insts, params):
    sig = np.stack([i.sig_lifted for i in insts]).astype(np.int32)
    pk_ntt = np.stack([ntt(i.h) for i in insts]).astype(np.int32)
    hm_ntt = np.stack([ntt(i.hm) for i in insts]).astype(np.int32)
    run = jitted_engine(params.n)
    seg = {k: np.asarray(v) for k, v in run(sig, pk_ntt, hm_ntt).items()}
    return interleave_witness(seg, params), seg


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_engine_bit_exact_vs_trace(rng, params):
    insts = [make_instance(rng, params) for _ in range(2)]
    mat, seg = _engine_matrix(insts, params)
    assert mat.shape == (2, num_witness(params))
    for b, inst in enumerate(insts):
        cs = ConstraintSystem()
        FalconNTTVerificationCircuit.build_circuit(inst).generate_constraints(cs)
        host = cs.witness_values
        eng = [int(x) for x in mat[b]]
        assert len(host) == len(eng)
        assert host == eng, [
            (i, host[i], eng[i]) for i in range(len(host)) if host[i] != eng[i]
        ][:5]


def test_engine_public_inputs(rng):
    insts = [make_instance(rng, FALCON_512)]
    _, seg = _engine_matrix(insts, FALCON_512)
    assert np.array_equal(seg["pk_ntt"][0], ntt(insts[0].h))
    assert np.array_equal(seg["hm_ntt"][0], ntt(insts[0].hm))


def test_limb_roundtrip(rng):
    vals = np.array(
        [0, 1, Q, 2**160 - 1, 12345678901234567890123456789], dtype=object
    )
    limbs = ints_to_limbs(vals)
    back = limbs_to_ints(limbs)
    assert list(back) == list(vals)


def test_limb_overflow_raises():
    with pytest.raises(OverflowError):
        ints_to_limbs(np.array([2**200], dtype=object))
