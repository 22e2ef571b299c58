"""End-to-end pipeline: wire bytes -> decoded batch -> device witness ->
canonical packed export, checked against the host trace and the CRT
satisfiability checker."""

import numpy as np
import pytest

from falcon_r1cs_tpu import ConstraintSystem, FalconNTTVerificationCircuit
from falcon_r1cs_tpu.falcon import (
    compress_signature,
    encode_public_key,
    make_instance,
)
from falcon_r1cs_tpu.params import FALCON_512
from falcon_r1cs_tpu.pipeline import ProverInputPipeline
from falcon_r1cs_tpu.witness import interleave_witness
from falcon_r1cs_tpu.witness.export_device import packer_ntt


def test_pipeline_wire_to_witness(rng):
    insts = [make_instance(rng, FALCON_512) for _ in range(2)]
    pk_bytes = [encode_public_key(i.h, FALCON_512) for i in insts]
    sig_bytes = [
        compress_signature(i.sig_signed, i.nonce, FALCON_512) for i in insts
    ]
    msgs = [i.msg for i in insts]

    pipe = ProverInputPipeline(FALCON_512, pack=True)
    out = pipe.run_wire(pk_bytes, msgs, sig_bytes)

    # packed export decodes to exactly the host-trace witness
    packed = np.asarray(out.packed).astype(np.int64) & 0xFFFFFFFF
    vals = np.zeros(packed.shape[:2], dtype=object)
    for k in range(4, -1, -1):
        vals = (vals << 32) + packed[:, :, k]
    for b, inst in enumerate(insts):
        cs = ConstraintSystem()
        FalconNTTVerificationCircuit.build_circuit(inst).generate_constraints(cs)
        assert list(vals[b]) == cs.witness_values


def test_pipeline_rejects_mixed_params(rng):
    from falcon_r1cs_tpu.params import FALCON_1024

    inst = make_instance(rng, FALCON_512)
    pk_bytes = [encode_public_key(inst.h, FALCON_512)]
    sig_bytes = [compress_signature(inst.sig_signed, inst.nonce, FALCON_512)]
    pipe = ProverInputPipeline(FALCON_1024, pack=False)
    with pytest.raises(ValueError):
        pipe.run_wire(pk_bytes, [inst.msg], sig_bytes)


def test_dual_and_schoolbook_packers(rng):
    """Device packers for the other two circuit families decode to the
    host interleave exactly."""
    import jax

    from falcon_r1cs_tpu.falcon import ntt
    from falcon_r1cs_tpu.witness import (
        interleave_witness_dual,
        interleave_witness_schoolbook,
        jitted_engine_dual,
        jitted_engine_schoolbook,
    )
    from falcon_r1cs_tpu.witness.export_device import (
        packer_dual,
        packer_schoolbook,
    )

    insts = [make_instance(rng, FALCON_512) for _ in range(2)]
    pk = np.stack([i.h for i in insts]).astype(np.int32)
    hm = np.stack([i.hm for i in insts]).astype(np.int32)
    pk_ntt = np.stack([ntt(i.h) for i in insts]).astype(np.int32)
    hm_ntt = np.stack([ntt(i.hm) for i in insts]).astype(np.int32)

    def unpack(packed, L):
        packed = np.asarray(packed).astype(np.int64) & 0xFFFFFFFF
        vals = np.zeros(packed.shape[:2], dtype=object)
        for k in range(L - 1, -1, -1):
            vals = (vals << 32) + packed[:, :, k]
        return vals

    sig_s = np.stack([i.sig_signed for i in insts]).astype(np.int32)
    seg = jitted_engine_dual(512)(sig_s, pk_ntt, hm_ntt)
    got = unpack(packer_dual(512)(seg), 5)
    want = interleave_witness_dual(
        {k: np.asarray(v) for k, v in seg.items()}, FALCON_512
    )
    assert (got == want).all()

    sig_l = np.stack([i.sig_lifted for i in insts]).astype(np.int32)
    seg2 = jitted_engine_schoolbook(512)(sig_l, pk, hm)
    got2 = unpack(packer_schoolbook(512)(seg2), 8)
    want2 = interleave_witness_schoolbook(
        {k: np.asarray(v) for k, v in seg2.items()}, FALCON_512
    )
    assert (got2 == want2).all()


def test_pipeline_chunking_matches_single_pass(rng):
    """Batches above max_chunk are processed in sub-batches and stitched;
    results must match the single-pass path exactly."""
    insts = [make_instance(rng, FALCON_512) for _ in range(5)]
    pk_bytes = [encode_public_key(i.h, FALCON_512) for i in insts]
    sig_bytes = [
        compress_signature(i.sig_signed, i.nonce, FALCON_512) for i in insts
    ]
    msgs = [i.msg for i in insts]
    big = ProverInputPipeline(FALCON_512, pack=True, max_chunk=2048)
    small = ProverInputPipeline(FALCON_512, pack=True, max_chunk=2)
    a = big.run_wire(pk_bytes, msgs, sig_bytes)
    b = small.run_wire(pk_bytes, msgs, sig_bytes)
    assert np.array_equal(np.asarray(a.packed), np.asarray(b.packed))
    for k in a.seg:
        assert np.array_equal(np.asarray(a.seg[k]), np.asarray(b.seg[k])), k


def test_circuit_witness_api(rng):
    """Unified per-circuit witness API: engine -> pack -> interleave parity
    for each circuit family."""
    import jax

    from falcon_r1cs_tpu import (
        FalconDualNTTVerificationCircuit,
        FalconSchoolBookVerificationCircuit,
    )
    from falcon_r1cs_tpu.falcon import ntt
    from falcon_r1cs_tpu.witness import circuit_witness

    inst = make_instance(rng, FALCON_512)
    pk_ntt = ntt(inst.h)[None].astype(np.int32)
    hm_ntt = ntt(inst.hm)[None].astype(np.int32)

    cw = circuit_witness(FalconNTTVerificationCircuit, 512)
    seg = cw.engine(inst.sig_lifted[None].astype(np.int32), pk_ntt, hm_ntt)
    packed = np.asarray(cw.pack(seg)).astype(np.int64) & 0xFFFFFFFF
    flat = cw.interleave(seg)
    vals = np.zeros(packed.shape[:2], dtype=object)
    for k in range(cw.export_limbs - 1, -1, -1):
        vals = (vals << 32) + packed[:, :, k]
    assert (vals == flat).all()

    cw = circuit_witness(FalconDualNTTVerificationCircuit, 512)
    seg = cw.engine(inst.sig_signed[None].astype(np.int32), pk_ntt, hm_ntt)
    assert cw.interleave(seg).shape[1] == 95286

    with pytest.raises(TypeError):
        circuit_witness(int, 512)
