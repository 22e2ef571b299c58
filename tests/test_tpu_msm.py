"""Differential tests for the TPU G1 MSM (snark/tpu_msm.py) and its
Montgomery limb core (ops/fq_mont.py) against the pure-Python BLS12-381
host implementation.

The MSM test uses a small window (2^4 buckets) so the Hillis-Steele
bucket scans stay CPU-sized; the production window (12) exercises the
identical code path with different static shapes.
"""

import secrets

import numpy as np
import pytest

from falcon_r1cs_tpu.ops import fq_mont as fq
from falcon_r1cs_tpu.snark import bls12_381 as bls
from falcon_r1cs_tpu.snark import tpu_msm
from falcon_r1cs_tpu.snark.points import G1Array


def _rand_fq(n):
    return [secrets.randbelow(bls.P) for _ in range(n)]


def test_mont_mul_matches_int():
    import jax.numpy as jnp

    xs, ys = _rand_fq(16), _rand_fq(16)
    a = jnp.asarray(fq.int_to_limbs([x * fq.R_MONT % bls.P for x in xs]))
    b = jnp.asarray(fq.int_to_limbs([y * fq.R_MONT % bls.P for y in ys]))
    out = np.asarray(fq.mont_mul(a, b))
    for i in range(16):
        want = xs[i] * ys[i] % bls.P * fq.R_MONT % bls.P
        # relaxed representation: representatives are unique only mod q
        assert fq.limbs_to_int(out[i]) % bls.P == want, i


def test_mont_roundtrip_add_sub():
    import jax.numpy as jnp

    xs, ys = _rand_fq(8), _rand_fq(8)
    a = jnp.asarray(fq.int_to_limbs(xs))
    b = jnp.asarray(fq.int_to_limbs(ys))
    back = np.asarray(fq.from_mont(fq.to_mont(a)))
    add = np.asarray(fq.add_mod(a, b))
    sub = np.asarray(fq.sub_mod(a, b))
    for i in range(8):
        # all outputs are relaxed representatives — compare mod q
        assert fq.limbs_to_int(back[i]) % bls.P == xs[i]
        assert fq.limbs_to_int(add[i]) % bls.P == (xs[i] + ys[i]) % bls.P
        assert fq.limbs_to_int(sub[i]) % bls.P == (xs[i] - ys[i]) % bls.P


def _to_jac_limbs(pts):
    """list of (affine | None) -> batched Jacobian mont-limb tensors."""
    import jax.numpy as jnp

    xs = [0 if p is None else p[0] * fq.R_MONT % bls.P for p in pts]
    ys = [0 if p is None else p[1] * fq.R_MONT % bls.P for p in pts]
    X = jnp.asarray(fq.int_to_limbs(xs))
    Y = jnp.asarray(fq.int_to_limbs(ys))
    Z = jnp.asarray(fq.int_to_limbs([fq.R_MONT % bls.P] * len(pts)))
    inf = jnp.asarray(np.asarray([p is None for p in pts]))
    return (X, Y, Z, inf)


def _from_jac_limbs(out, i):
    X, Y, Z, inf = (np.asarray(t) for t in out)
    if bool(inf[i]):
        return None
    rinv = pow(fq.R_MONT, -1, bls.P)
    x = fq.limbs_to_int(X[i]) * rinv % bls.P
    y = fq.limbs_to_int(Y[i]) * rinv % bls.P
    z = fq.limbs_to_int(Z[i]) * rinv % bls.P
    zinv = pow(z, -1, bls.P)
    return (
        x * zinv * zinv % bls.P,
        y * zinv * zinv % bls.P * zinv % bls.P,
    )


def test_point_add_matches_host():
    import jax

    g = bls.G1_GEN
    gen = bls.g1_from_affine(g)
    p2 = bls.g1_to_affine(bls.g1_mul(gen, 7))
    neg_g = (g[0], bls.P - g[1])
    # rows: generic add, tangent (P+P), chord-to-infinity (P + -P),
    # inf + P, P + inf, inf + inf
    lhs = [g, g, g, None, p2, None]
    rhs = [p2, g, neg_g, p2, None, None]
    out = jax.jit(tpu_msm.point_add)(_to_jac_limbs(lhs), _to_jac_limbs(rhs))
    for i, (a, b) in enumerate(zip(lhs, rhs)):
        pa = None if a is None else bls.g1_from_affine(a)
        pb = None if b is None else bls.g1_from_affine(b)
        want = bls.g1_to_affine(bls.g1_add(pa, pb))
        assert _from_jac_limbs(out, i) == want, i


@pytest.mark.slow
def test_msm_small_window_matches_host():
    n = 8
    ks = [secrets.randbelow(1000) + 1 for _ in range(n)]
    scalars = [secrets.randbelow(bls.R) for _ in range(n)]
    scalars[3] = 0  # zero-scalar row
    gen = bls.g1_from_affine(bls.G1_GEN)
    pts = [bls.g1_to_affine(bls.g1_mul(gen, k)) for k in ks]
    pts[5] = None  # infinity row
    arr = G1Array.from_affine_list(pts)
    got = tpu_msm.g1_msm_tpu(arr, scalars, window=4)
    acc = None
    for p, s in zip(pts, scalars):
        if p is None or s == 0:
            continue
        acc = bls.g1_add(acc, bls.g1_mul(bls.g1_from_affine(p), s))
    want = bls.g1_to_affine(acc)
    assert got == want


def test_prove_with_tpu_g1_backend(monkeypatch):
    """Same toxic waste + blinding => bit-identical proof regardless of
    which backend ran the G1 MSMs."""
    from falcon_r1cs_tpu.snark.groth16 import SetupToxic, prove, setup, verify
    from tests.test_snark import _toy_circuit

    monkeypatch.setattr(tpu_msm, "WINDOW", 4)
    compiled, assignment = _toy_circuit()
    tox = SetupToxic(tau=11, alpha=12, beta=13, gamma=14, delta=15)
    pk = setup(compiled, toxic=tox, use_native=False)
    host = prove(pk, compiled, assignment, r=21, s=22, use_native=False)
    dev = prove(
        pk, compiled, assignment, r=21, s=22, use_native=False,
        g1_backend="tpu",
    )
    assert dev == host
    assert verify(pk.vk, [1, 35], dev)


def test_msm_all_zero_is_infinity():
    pts = [bls.G1_GEN] * 4
    arr = G1Array.from_affine_list(pts)
    assert tpu_msm.g1_msm_tpu(arr, [0, 0, 0, 0], window=4) is None


@pytest.mark.slow
def test_msm_multi_matches_single_tpu():
    """K-fold batched MSM (g1_msm_tpu_multi, the prove_batch shape)
    vs per-k g1_msm_tpu: full-width, bits, all-zero (infinity), and
    repeated-scalar vectors over one 8-point set."""
    n = 8
    gen = bls.g1_from_affine(bls.G1_GEN)
    pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(n)]
    pts[5] = None
    arr = G1Array.from_affine_list(pts)
    vectors = [
        [secrets.randbelow(bls.R) for _ in range(n)],
        [0] * n,
        [secrets.randbelow(2) for _ in range(n)],
        [7] * n,
    ]
    got = tpu_msm.g1_msm_tpu_multi(arr, vectors, window=4)
    for k, sc in enumerate(vectors):
        assert got[k] == tpu_msm.g1_msm_tpu(arr, sc, window=4), f"k={k}"


@pytest.mark.slow
def test_msm_sharded_matches_single():
    """Point-axis sharded MSM across the 8-device virtual mesh equals the
    single-device result (and the host reduction)."""
    import jax

    n = 40  # deliberately not a multiple of 8: exercises padding
    ks = [secrets.randbelow(500) + 1 for k in range(n)]
    scalars = [secrets.randbelow(bls.R) for _ in range(n)]
    scalars[7] = 0
    gen = bls.g1_from_affine(bls.G1_GEN)
    pts = [bls.g1_to_affine(bls.g1_mul(gen, k)) for k in ks]
    pts[11] = None
    arr = G1Array.from_affine_list(pts)
    single = tpu_msm.g1_msm_tpu(arr, scalars, window=4)
    sharded = tpu_msm.g1_msm_tpu_sharded(
        arr, scalars, window=4, devices=jax.devices()
    )
    assert sharded == single


@pytest.mark.slow
def test_msm_chunked_path_matches_host(monkeypatch):
    """Force nc>1 (the TPU-backend-regression mitigation: per-chunk sort
    + bucket reduce, pairwise tree merge of the dense per-chunk bucket
    buffers) with a tiny _SAFE_ROWS so the chunked code paths — vmap
    group, lax.map grouping, cross-chunk segment splits — run on CPU.
    Covers scalars that collide across chunk boundaries (split bucket
    segments) and zero/infinity rows inside chunks."""
    monkeypatch.setattr(tpu_msm, "_SAFE_ROWS", 8)
    # also force the lax.map group split (gc < nc)
    monkeypatch.setattr(tpu_msm, "_MULTI_LANE_BUDGET", 16)
    tpu_msm._msm_jit.cache_clear()
    tpu_msm._msm_multi_jit.cache_clear()
    try:
        n = 32  # nc = 4 chunks of 8, gc = 2
        gen = bls.g1_from_affine(bls.G1_GEN)
        pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(n)]
        pts[9] = None
        arr = G1Array.from_affine_list(pts)
        scalars = [secrets.randbelow(16) for _ in range(n)]  # window=4 digits
        scalars[3] = 0
        # heavy cross-chunk collisions: one digit value spans chunks 1-3
        for i in range(6, 26):
            scalars[i] = 5
        got = tpu_msm.g1_msm_tpu(arr, scalars, window=4)
        acc = None
        for p, s in zip(pts, scalars):
            if p is None or s == 0:
                continue
            acc = bls.g1_add(acc, bls.g1_mul(bls.g1_from_affine(p), s))
        assert got == bls.g1_to_affine(acc)
        # the K-fold path through the same chunking
        vectors = [scalars, [1] * n, [secrets.randbelow(bls.R) for _ in range(n)]]
        multi = tpu_msm.g1_msm_tpu_multi(arr, vectors, window=4)
        for k, sc in enumerate(vectors):
            assert multi[k] == tpu_msm.g1_msm_tpu(arr, sc, window=4), f"k={k}"
    finally:
        tpu_msm._msm_jit.cache_clear()
        tpu_msm._msm_multi_jit.cache_clear()


@pytest.mark.slow
def test_msm_pallas_flat_path_matches_host(monkeypatch):
    """The round-4 Pallas MSM path — the limb-major wide-tree engine
    (snark/tpu_msm_blocks.py): bit-reversed contiguous-half merge tree
    with ALL windows sharing each level's kernel dispatch, log-depth
    weighted sums, every point_add through the fused VMEM kernel
    (interpret mode on CPU) — against the pure-Python host oracle,
    including zero scalars, an infinity point, heavy same-digit runs
    (split segments), a MULTI-GROUP window split (env cap 40 over
    nW=64 resolves to two lax.map groups of 32), and the K-fold multi
    entry (g1_msm_blocks_multi)."""
    import falcon_r1cs_tpu.ops.pallas_fq as pfq
    import falcon_r1cs_tpu.snark.tpu_msm_blocks as tmb

    monkeypatch.setattr(pfq, "FORCE_INTERPRET", True)
    # nW=64 at window=4, cap 40 -> G=32: two lax.map wide-tree groups
    # exercise the serialized group loop and the stacked-output reshape
    monkeypatch.setenv("FALCON_R1CS_TPU_MSM_GROUP", "40")
    tpu_msm._msm_jit.cache_clear()
    tpu_msm._msm_multi_jit.cache_clear()
    tmb.msm_window_sums_jit.cache_clear()
    tmb._premont_jit.cache_clear()
    pfq._build_point_add_cached.cache_clear()
    try:
        n = 32
        gen = bls.g1_from_affine(bls.G1_GEN)
        pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(n)]
        pts[9] = None
        arr = G1Array.from_affine_list(pts)
        scalars = [secrets.randbelow(16) for _ in range(n)]
        scalars[3] = 0
        for i in range(6, 26):
            scalars[i] = 5  # heavy same-digit runs (split segments)
        got = tpu_msm.g1_msm_tpu(arr, scalars, window=4, use_pallas=True)

        def host(sc):
            acc = None
            for p, s in zip(pts, sc):
                if p is None or s == 0:
                    continue
                acc = bls.g1_add(acc, bls.g1_mul(bls.g1_from_affine(p), s))
            return bls.g1_to_affine(acc) if acc is not None else None

        assert got == host(scalars)
    finally:
        tpu_msm._msm_jit.cache_clear()
        tmb.msm_window_sums_jit.cache_clear()
        pfq._build_point_add_cached.cache_clear()


@pytest.mark.slow
def test_msm_pallas_multi_matches_host(monkeypatch):
    """K-fold multi through the wide tree (g1_msm_blocks_multi): all
    K*nw scalar windows ride one limb-major tree and the Horner fold
    runs K lanes wide.  Tiny shape (n=16, window=4) — the tree core is
    shared with the single-MSM test above; what's specific here is the
    (nw, K, n) flatten, the (NL, nw, K) reshape back, and the K-wide
    fold, all of which a wrong stride would break.  Pins the "limb"
    bucket-bank fallback so both bank layouts stay covered (the
    flat-path test above runs the default "row" bank)."""
    import falcon_r1cs_tpu.ops.pallas_fq as pfq
    import falcon_r1cs_tpu.snark.tpu_msm_blocks as tmb

    monkeypatch.setattr(pfq, "FORCE_INTERPRET", True)
    monkeypatch.setenv("FALCON_R1CS_TPU_MSM_BANK", "limb")
    tpu_msm._msm_multi_jit.cache_clear()
    tmb.msm_window_sums_jit.cache_clear()
    tmb._premont_jit.cache_clear()
    pfq._build_point_add_cached.cache_clear()
    try:
        n = 16
        gen = bls.g1_from_affine(bls.G1_GEN)
        pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(n)]
        pts[5] = None
        arr = G1Array.from_affine_list(pts)

        def host(sc):
            acc = None
            for p, s in zip(pts, sc):
                if p is None or s == 0:
                    continue
                acc = bls.g1_add(acc, bls.g1_mul(bls.g1_from_affine(p), s))
            return bls.g1_to_affine(acc) if acc is not None else None

        vectors = [
            [secrets.randbelow(bls.R) for _ in range(n)],
            [0] * (n - 2) + [3, bls.R - 1],  # near-empty + boundary scalar
        ]
        multi = tpu_msm.g1_msm_tpu_multi(
            arr, vectors, window=4, use_pallas=True
        )
        for k, sc in enumerate(vectors):
            assert multi[k] == host(sc), f"k={k}"
    finally:
        tpu_msm._msm_multi_jit.cache_clear()
        tmb.msm_window_sums_jit.cache_clear()
        pfq._build_point_add_cached.cache_clear()


def test_dispatch_cap_probe_and_clamp(monkeypatch):
    """The watchdog cap (ENGINEERING.md '~100 s dispatch watchdog')
    derives from measured rate x budget with the empirical constants as
    clamped priors, and the env override wins outright (round 5,
    VERDICT r4 #8)."""
    monkeypatch.delenv("FALCON_R1CS_TPU_MAX_DISPATCH_LANES", raising=False)
    monkeypatch.delenv("FALCON_R1CS_TPU_DISPATCH_BUDGET_S", raising=False)
    monkeypatch.setattr(tpu_msm, "_MEASURED_LANE_RATE", {})

    # no probe yet: the empirical priors
    assert tpu_msm.max_dispatch_lanes(False) == tpu_msm._MAX_DISPATCH_LANES
    assert (
        tpu_msm.max_dispatch_lanes(True)
        == tpu_msm._MAX_DISPATCH_LANES_PALLAS
    )

    # a measured rate scales the cap: 2^17 lanes in 10 s at 50 s budget
    # -> 655k lanes -> floored to 2^19
    tpu_msm.record_dispatch_rate(1 << 17, 10.0, True)
    assert tpu_msm.max_dispatch_lanes(True) == 1 << 19

    # sub-2 s timings are tunnel noise and must be ignored
    tpu_msm.record_dispatch_rate(1 << 20, 0.1, False)
    assert tpu_msm.max_dispatch_lanes(False) == tpu_msm._MAX_DISPATCH_LANES

    # the slowest observed rate wins (conservative under drift)
    tpu_msm.record_dispatch_rate(1 << 17, 40.0, True)
    assert tpu_msm.max_dispatch_lanes(True) == max(
        tpu_msm._MAX_DISPATCH_LANES_PALLAS // 4,
        1 << (int((1 << 17) / 40.0 * 50.0).bit_length() - 1),
    )

    # a wildly optimistic probe clamps at prior*4, a pessimistic one at
    # prior/4 — neither can produce a crash-capable dispatch
    monkeypatch.setattr(tpu_msm, "_MEASURED_LANE_RATE", {True: 1e12})
    assert (
        tpu_msm.max_dispatch_lanes(True)
        == tpu_msm._MAX_DISPATCH_LANES_PALLAS * 4
    )
    monkeypatch.setattr(tpu_msm, "_MEASURED_LANE_RATE", {True: 1.0})
    assert (
        tpu_msm.max_dispatch_lanes(True)
        == tpu_msm._MAX_DISPATCH_LANES_PALLAS // 4
    )

    # env override: exact power-of-two floor of the requested value
    monkeypatch.setenv("FALCON_R1CS_TPU_MAX_DISPATCH_LANES", "300000")
    assert tpu_msm.max_dispatch_lanes(True) == 1 << 18

    # the budget env scales the derived cap (2^17/10 lanes/s x 25 s ->
    # 327k, floored to 2^18 — but the prior/4 clamp floor at 2^19 binds)
    monkeypatch.delenv("FALCON_R1CS_TPU_MAX_DISPATCH_LANES")
    monkeypatch.setenv("FALCON_R1CS_TPU_DISPATCH_BUDGET_S", "25")
    monkeypatch.setattr(
        tpu_msm, "_MEASURED_LANE_RATE", {True: (1 << 17) / 10.0}
    )
    assert (
        tpu_msm.max_dispatch_lanes(True)
        == tpu_msm._MAX_DISPATCH_LANES_PALLAS // 4
    )


def test_group_windows_divisor(monkeypatch):
    """_group_windows returns a DIVISOR of the window count within the
    HBM cap (round 5: equal-width groups are what lets lax.map
    serialize them — the unrolled Python loop OOMed at K=8 because XLA
    overlapped independent groups' temps)."""
    import falcon_r1cs_tpu.snark.tpu_msm_blocks as tmb

    monkeypatch.delenv("FALCON_R1CS_TPU_MSM_GROUP", raising=False)
    # h_query shape: cap ~43 at n=2^17 -> 22 divides both 22 and 22*K
    assert tmb._group_windows(1 << 17, 22) == 22
    for K in (2, 4, 8):
        g = tmb._group_windows(1 << 17, 22 * K)
        assert (22 * K) % g == 0 and g <= 43
    # small n: cap exceeds nw -> one group
    assert tmb._group_windows(1 << 10, 64) == 64
    # env cap rounds DOWN to a divisor
    monkeypatch.setenv("FALCON_R1CS_TPU_MSM_GROUP", "40")
    assert tmb._group_windows(1 << 10, 64) == 32
    monkeypatch.setenv("FALCON_R1CS_TPU_MSM_GROUP", "1")
    assert tmb._group_windows(1 << 10, 64) == 1


def test_signed_digit_recode_identity():
    """_window_digits_signed (round 5): magnitudes bounded by 2^(w-1),
    sign-packed, and the signed digits reconstruct every scalar exactly
    — sum_w d'_w * 2^(w*window) == scalar, including the boundary
    values 0, 1, r-1 and the carry-heavy all-ones patterns."""
    from falcon_r1cs_tpu.snark.points import ints_to_limbs

    for window in (4, 12, 13):
        scalars = (
            [secrets.randbelow(bls.R) for _ in range(40)]
            + [0, 1, bls.R - 1, (1 << 255) % bls.R,
               int("0x" + "fff" * 21, 16) % bls.R]
        )
        packed = tpu_msm._window_digits_signed(
            ints_to_limbs(scalars, 4), window
        )
        mask = (1 << window) - 1
        half = 1 << (window - 1)
        for i, s in enumerate(scalars):
            tot = 0
            for w in range(packed.shape[0]):
                p = int(packed[w, i])
                mag = p & mask
                assert mag <= half, (window, w, mag)
                tot += (-mag if p >> window else mag) << (window * w)
            assert tot == s, (window, i)
