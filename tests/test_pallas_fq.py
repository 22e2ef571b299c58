"""Pallas Fq kernels (ops/pallas_fq.py) — bit-equality vs the XLA path.

Interpret mode (hermetic CPU lane): the kernels must produce the exact
int32 limb tensors of ops/fq_mont.py / snark/tpu_msm.point_add,
including the chord/tangent/infinity select paths.  The on-chip
throughput story lives in tools/bench_pallas_fq.py + ENGINEERING.md.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import falcon_r1cs_tpu.ops.fq_mont as fq
import falcon_r1cs_tpu.ops.pallas_fq as pf

rng = np.random.default_rng(20260820)


def _rand_fq(r):
    return jnp.asarray(
        fq.int_to_limbs(
            [int.from_bytes(rng.bytes(47), "little") % fq.Q381
             for _ in range(r)]
        )
    )


def test_blocks_round_trip():
    a = _rand_fq(2048)
    back = np.asarray(pf.from_blocks(pf.to_blocks(a)))
    assert np.array_equal(back, np.asarray(a))
    f = jnp.asarray(rng.integers(0, 2, 1024).astype(bool))
    assert np.array_equal(
        np.asarray(pf.flags_from_blocks(pf.flags_to_blocks(f))),
        np.asarray(f),
    )


def test_mont_mul_bit_equal():
    a = _rand_fq(1024)
    b = _rand_fq(1024)
    want = np.asarray(fq.mont_mul(a, b))
    got = np.asarray(
        pf.from_blocks(
            pf.mont_mul_pallas(pf.to_blocks(a), pf.to_blocks(b),
                               interpret=True)
        )
    )
    assert np.array_equal(got, want)


def test_mont_mul_chain_bit_equal():
    """Depth-3 chain — the op class the TPU XLA backend miscompiles at
    >= 2^13 rows (ENGINEERING.md '8192-row cliff'); the Pallas kernel
    must match the (CPU-exact) XLA composition."""
    a = _rand_fq(1024)
    b = _rand_fq(1024)
    x = fq.mont_mul(a, b)
    for _ in range(2):
        x = fq.mont_mul(x, b)
    got = np.asarray(
        pf.from_blocks(
            pf.mont_mul_chain_pallas(pf.to_blocks(a), pf.to_blocks(b), 3,
                                     interpret=True)
        )
    )
    assert np.array_equal(got, np.asarray(x))


def test_point_add_bit_equal_all_paths():
    """Complete-addition select paths: generic chord, doubling (same
    point), P + (-P) -> infinity, and infinity operands — all bit-equal
    to snark/tpu_msm.point_add."""
    import falcon_r1cs_tpu.snark.tpu_msm as tm
    from falcon_r1cs_tpu.snark import bls12_381 as bls, msm
    from falcon_r1cs_tpu.snark.points import G1Array

    R = 1024
    seed = [int(s) for s in rng.integers(1, 2**31, R)]
    pts = msm.g1_normalize_batch(
        msm.g1_fixed_base(bls.G1_GEN).mul_batch(seed)
    )
    arr = G1Array.from_affine_list(pts)
    Xs, Ys, _ = tm._points_std_limbs(arr, R)
    X = fq.to_mont(jnp.asarray(Xs))
    Y = fq.to_mont(jnp.asarray(Ys))
    z_one = fq.int_to_limbs([(1 << 408) % bls.P])
    Z = jnp.asarray(np.broadcast_to(z_one, (R, fq.NL)).copy())

    perm = rng.permutation(R)
    X2, Y2, Z2 = X[perm], Y[perm], Z[perm]
    # rows 0:64 doubling; 64:96 P + (-P); 96:128 inf1; 128:160 inf2
    X2 = X2.at[:96].set(X[:96])
    Z2 = Z2.at[:96].set(Z[:96])
    Y2 = Y2.at[:64].set(Y[:64])
    Y2 = Y2.at[64:96].set(
        fq.sub_mod(jnp.zeros_like(Y[64:96]), Y[64:96])
    )
    inf1 = np.zeros(R, bool)
    inf1[96:128] = True
    inf2 = np.zeros(R, bool)
    inf2[128:160] = True

    p1 = (X, Y, Z, jnp.asarray(inf1))
    p2 = (X2, Y2, Z2, jnp.asarray(inf2))
    wx, wy, wz, winf = tm.point_add(p1, p2)

    b1 = (pf.to_blocks(X), pf.to_blocks(Y), pf.to_blocks(Z),
          pf.flags_to_blocks(jnp.asarray(inf1)))
    b2 = (pf.to_blocks(X2), pf.to_blocks(Y2), pf.to_blocks(Z2),
          pf.flags_to_blocks(jnp.asarray(inf2)))
    gx, gy, gz, ginf = pf.point_add_pallas(b1, b2, interpret=True)
    assert np.array_equal(np.asarray(pf.from_blocks(gx)), np.asarray(wx))
    assert np.array_equal(np.asarray(pf.from_blocks(gy)), np.asarray(wy))
    assert np.array_equal(np.asarray(pf.from_blocks(gz)), np.asarray(wz))
    got_inf = np.asarray(pf.flags_from_blocks(ginf))
    assert np.array_equal(got_inf, np.asarray(winf))
    assert got_inf[64:96].all()  # the P + (-P) rows really hit infinity


def test_point_add_affine_kernel_matches_generic():
    """The level-1 affine-add kernel (round 5): same select paths as
    the generic kernel driven with Z = one.  Intermediate limb
    REPRESENTATIVES legitimately differ (the skipped by-one mont_muls
    re-relax operands in the generic kernel), so equality is asserted
    where it is contractual: infinity flags bit-equal, every finite
    output equal as a NORMALIZED affine point."""
    import falcon_r1cs_tpu.snark.tpu_msm as tm
    from falcon_r1cs_tpu.snark import bls12_381 as bls, msm
    from falcon_r1cs_tpu.snark.points import G1Array

    R = 1024
    seed = [int(s) for s in rng.integers(1, 2**31, R)]
    pts = msm.g1_normalize_batch(
        msm.g1_fixed_base(bls.G1_GEN).mul_batch(seed)
    )
    arr = G1Array.from_affine_list(pts)
    Xs, Ys, _ = tm._points_std_limbs(arr, R)
    X = fq.to_mont(jnp.asarray(Xs))
    Y = fq.to_mont(jnp.asarray(Ys))
    z_one = fq.int_to_limbs([(1 << 408) % bls.P])
    Z = jnp.asarray(np.broadcast_to(z_one, (R, fq.NL)).copy())

    perm = rng.permutation(R)
    X2, Y2 = X[perm], Y[perm]
    # rows 0:64 doubling; 64:96 P + (-P); 96:128 inf1; 128:160 inf2
    X2 = X2.at[:96].set(X[:96])
    Y2 = Y2.at[:64].set(Y[:64])
    Y2 = Y2.at[64:96].set(
        fq.sub_mod(jnp.zeros_like(Y[64:96]), Y[64:96])
    )
    inf1 = np.zeros(R, bool)
    inf1[96:128] = True
    inf2 = np.zeros(R, bool)
    inf2[128:160] = True

    wx, wy, wz, winf = tm.point_add(
        (X, Y, Z, jnp.asarray(inf1)), (X2, Y2, Z, jnp.asarray(inf2))
    )
    a1 = (pf.to_blocks(X), pf.to_blocks(Y),
          pf.flags_to_blocks(jnp.asarray(inf1)))
    a2 = (pf.to_blocks(X2), pf.to_blocks(Y2),
          pf.flags_to_blocks(jnp.asarray(inf2)))
    gx, gy, gz, ginf = pf.point_add_aff_pallas(a1, a2, interpret=True)
    gx = np.asarray(pf.from_blocks(gx))
    gy = np.asarray(pf.from_blocks(gy))
    gz = np.asarray(pf.from_blocks(gz))
    ginf = np.asarray(pf.flags_from_blocks(ginf))
    wx, wy, wz, winf = (np.asarray(t) for t in (wx, wy, wz, winf))
    assert np.array_equal(ginf, winf)
    check = list(range(0, 192)) + [int(i) for i in rng.integers(192, R, 24)]
    for i in check:
        if ginf[i]:
            continue
        got = tm._jac_mont_to_affine(gx[i], gy[i], gz[i])
        want = tm._jac_mont_to_affine(wx[i], wy[i], wz[i])
        assert got == want, i
