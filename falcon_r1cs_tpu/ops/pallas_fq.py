"""Pallas TPU kernels for BLS12-381 Fq Montgomery arithmetic (VMEM-resident).

The XLA formulation (ops/fq_mont.py) is HBM-bound: every one of
point_add's 17 chained `mont_mul`s materializes its 71-column product
buffer and intermediate reps in HBM, and the TPU backend additionally
MISCOMPILES chained limb products on rank-2 tensors with leading axis
>= 2^13 (ENGINEERING.md "the 8192-row cliff"), forcing a chunked-shape
mitigation that pays ~2x adds.  These kernels keep the whole limb state
in VMEM scratch across a full Montgomery product — and across all 17 of
a complete Jacobian point addition — writing only the 35-limb results;
Mosaic is proven unaffected by the miscompile (the witness kernels), so
no shape mitigation applies.

Layout: LIMB-MAJOR blocks.  A batch of R field elements is shaped
(NL, R/1024, 8, 128) — limb l of points [1024*b, 1024*(b+1)) lives in
the (8, 128) int32 tile [l, b].  Each limb row is exactly one VPU tile,
so the anti-diagonal accumulation
    prod[i : i+35] += a[i] * b          (i = 0..34, static unroll)
runs as 35 vectorized multiply-accumulates over 35-tile slabs with
STATIC leading-axis slices — the op class the witness NTT kernels proved
on Mosaic.  The arithmetic is IDENTICAL to ops/fq_mont.py — same relaxed
signed 12-bit limbs, same semi-normalization rounds, same f32 carry
estimate, same spill fold — so outputs are bit-equal to the XLA path
(tests/test_pallas_fq.py).  Constant limb vectors (mu, q) and the
estimate/CRT weight tables ride along as lane-broadcast VMEM inputs
(pallas kernels may not capture array constants).

Conversion between the MSM row layout (R, 35) and limb-major blocks is
one XLA transpose at the boundary (`to_blocks` / `from_blocks`); chained
use (the point pipeline) stays in block layout throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fq_mont import (
    LIMB,
    MASK,
    MU_LIMBS,
    NL,
    NSIG,
    PROD,
    Q_LIMBS,
    _ALPHA_W,
    _CARRY_W,
    _CRT_PRIMES,
    _CRT_RECIP,
    _CRT_W,
    _ZCOLS,
)

BLK = 1024  # points per grid step: limb rows are (8, 128) tiles

# test hook: force interpret-mode execution of every kernel built after
# setting it (hermetic CPU lanes exercise the pallas-MSM path this way)
FORCE_INTERPRET = False


def _lane_tab(vec, dtype):
    """(n,) constant vector -> (n, 128) lane-broadcast table."""
    v = np.asarray(vec, dtype)
    return np.ascontiguousarray(np.broadcast_to(v[:, None], (len(v), 128)))


_MU_TAB = _lane_tab(MU_LIMBS, np.int32)              # (NSIG, 128)
_Q_TAB = _lane_tab(Q_LIMBS, np.int32)                # (NL, 128)
_CW_TAB = _lane_tab(_CARRY_W, np.float32)            # (NSIG, 128)
_AW_TAB = _lane_tab(_ALPHA_W, np.float32)            # (NL, 128)
_CRTW_TAB = np.ascontiguousarray(
    np.broadcast_to(np.asarray(_CRT_W, np.int32)[:, :, None],
                    (_ZCOLS, _CRT_W.shape[1], 128))
)                                                    # (ZCOLS, 30, 128)
_CRTP_TAB = _lane_tab(_CRT_PRIMES, np.int32)         # (30, 128)
_CRTR_TAB = _lane_tab(_CRT_RECIP, np.float32)        # (30, 128)

# canonical limbs of 1 in the Montgomery domain (the implicit affine Z
# of the affine-add kernel), as an (NL, 128) lane table
from . import fq_mont as _fqm

_ZONE_TAB = _lane_tab(
    _fqm.int_to_limbs(
        [_fqm.R_MONT % _fqm.limbs_to_int(np.asarray(Q_LIMBS))]
    )[0],
    np.int32,
)


# --------------------------------------------------------------------------
# layout converters (XLA, at the kernel boundary)
# --------------------------------------------------------------------------


def to_blocks(x):
    """(R, NL) int32 -> (NL, R//BLK, 8, 128); R must divide by BLK."""
    r = x.shape[0]
    assert r % BLK == 0, r
    return jnp.transpose(x, (1, 0)).reshape(NL, r // BLK, 8, 128)


def from_blocks(xb):
    """(NL, NB, 8, 128) -> (R, NL)."""
    nb = xb.shape[1]
    return jnp.transpose(xb.reshape(NL, nb * BLK), (1, 0))


def flags_to_blocks(f):
    """(R,) bool/int -> (R//BLK, 8, 128) int32."""
    r = f.shape[0]
    return f.astype(jnp.int32).reshape(r // BLK, 8, 128)


def flags_from_blocks(fb):
    return fb.reshape(-1) != 0


# --------------------------------------------------------------------------
# in-kernel primitives ((rows, 8, 128) arrays; const tables as args)
# --------------------------------------------------------------------------


def _zero_prod(prod_ref):
    prod_ref[...] = jnp.zeros(prod_ref.shape, prod_ref.dtype)


def _accum_big_mul(a_arr, b_arr, prod_ref):
    """prod[i : i+NL] += a[i] * b, i = 0..NL-1 — the anti-diagonal fold
    of fq_mont._big_mul as NL slab MACs with static leading slices."""
    for i in range(NL):
        ai = a_arr[i]  # (8, 128), static index
        prod_ref[i : i + NL] = prod_ref[i : i + NL] + ai[None] * b_arr


def _accum_const_mul(m_arr, cl_tab, prod_ref, nm: int):
    """prod[i : i+nc] += m[i] * const, with the constant limb vector as
    an (nc, 128) lane-broadcast table (mu or q) — fq_mont._const_mul's
    role, VPU form (the MXU int8 trick is an HBM-pressure workaround
    the VMEM kernel does not need)."""
    cl = cl_tab[:, None, :]  # (nc, 1, 128)
    for i in range(nm):
        mi = m_arr[i][None]  # (1, 8, 128)
        nc = cl.shape[0]
        prod_ref[i : i + nc] = prod_ref[i : i + nc] + mi * cl


def _semi_round_arr(t):
    """fq_mont._semi_round on an (L, 8, 128) array: out[k] = (t[k] &
    MASK) + (t[k-1] >> LIMB) for k < L-1; top row keeps its full value
    plus the incoming carry.  (All indices explicit-positive: Mosaic
    lowers NEGATIVE integer indexing to dynamic_slice, which the TPU
    pallas path does not implement.)"""
    L = t.shape[0]
    low = jnp.bitwise_and(t, MASK)
    carry = jnp.right_shift(t, LIMB)
    mid = low[1 : L - 1] + carry[0 : L - 2]
    top = t[L - 1] + carry[L - 2]
    return jnp.concatenate([low[0:1], mid, top[None]], axis=0)


def _semi_arr(t, rounds: int = 3):
    for _ in range(rounds):
        t = _semi_round_arr(t)
    return t


def _carry_estimate_arr(s_low, cw_tab):
    """f32 dot over the low NSIG limb rows (fq_mont._carry_estimate)."""
    est = jnp.sum(s_low.astype(jnp.float32) * cw_tab[:, None, :], axis=0)
    return jnp.round(est).astype(jnp.int32)


def _mont_mul_arr(a_arr, b_arr, prod_ref, mu_tab, q_tab, cw_tab):
    """One lazy Montgomery product on (NL, 8, 128) slabs; prod_ref is a
    (PROD, 8, 128) scratch reused across calls.  Mirrors
    fq_mont.mont_mul step for step (same exactness argument)."""
    _zero_prod(prod_ref)
    _accum_big_mul(a_arr, b_arr, prod_ref)
    t_full = _semi_arr(prod_ref[...])

    _zero_prod(prod_ref)
    _accum_const_mul(t_full[:NSIG], mu_tab, prod_ref, NSIG)
    m = _semi_arr(prod_ref[...])[:NSIG]

    _zero_prod(prod_ref)
    _accum_const_mul(m, q_tab, prod_ref, NSIG)
    u = _semi_arr(prod_ref[...])

    s = _semi_round_arr(t_full + u)
    k = _carry_estimate_arr(s[:NSIG], cw_tab)
    hi = s[NSIG : NSIG + NL]
    spill0 = s[NSIG + NL]
    spill1 = s[NSIG + NL + 1]
    top = hi[NL - 1] + (spill0 << LIMB) + (spill1 << (2 * LIMB))
    return jnp.concatenate(
        [(hi[0] + k)[None], hi[1 : NL - 1], top[None]], axis=0
    )


def _add_arr(a, b):
    return _semi_round_arr(a + b)


def _sub_arr(a, b):
    return _semi_round_arr(a - b)


def _dbl_arr(a, times=1):
    out = a
    for _ in range(times):
        out = _add_arr(out, out)
    return out


def _is_zero_arr(t, q_tab, aw_tab, crtw_tab, crtp_tab, crtr_tab):
    """fq_mont.is_zero_mod_q on an (NL, 8, 128) slab -> (8, 128) int32
    0/1 mask.  alpha f32 dot, z = t - alpha*q, 3 semi rounds over a
    _ZCOLS-row buffer, 30-prime CRT residues (vectorized over a leading
    prime axis), all-zero test."""
    alpha = jnp.round(
        jnp.sum(t.astype(jnp.float32) * aw_tab[:, None, :], axis=0)
    ).astype(jnp.int32)
    z = t - alpha[None] * q_tab[:, None, :]
    z = jnp.concatenate(
        [z, jnp.zeros((_ZCOLS - NL,) + z.shape[1:], z.dtype)], axis=0
    )
    z = _semi_arr(z, rounds=3)
    # residues: r[p] = sum_i z[i] * W[i, p]  -> (30, 8, 128)
    nprimes = crtp_tab.shape[0]
    r = jnp.zeros((nprimes, 8, 128), jnp.int32)
    for i in range(_ZCOLS):  # static: 37 vectorized MACs over 30 rows
        r = r + z[i][None] * crtw_tab[i][:, None, :]
    kq = jnp.round(
        r.astype(jnp.float32) * crtr_tab[:, None, :]
    ).astype(jnp.int32) * crtp_tab[:, None, :]
    return jnp.all(r == kq, axis=0).astype(jnp.int32)


def _eq_arr(a, b, q_tab, aw_tab, crtw_tab, crtp_tab, crtr_tab):
    return _is_zero_arr(
        _sub_arr(a, b), q_tab, aw_tab, crtw_tab, crtp_tab, crtr_tab
    )


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

_FQ_SPEC = pl.BlockSpec((NL, 1, 8, 128), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
_FL_SPEC = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


_MUL_CONSTS = (_MU_TAB, _Q_TAB, _CW_TAB)
_MUL_CONST_SPECS = [_const_spec(t.shape) for t in _MUL_CONSTS]
_EQ_CONSTS = (_AW_TAB, _CRTW_TAB, _CRTP_TAB, _CRTR_TAB)
_EQ_CONST_SPECS = [_const_spec(t.shape) for t in _EQ_CONSTS]


def _build_mul(depth: int, interpret: bool = False):
    return _build_mul_cached(depth, interpret or FORCE_INTERPRET)


@functools.lru_cache(maxsize=None)
def _build_mul_cached(depth: int, interpret: bool):
    import jax as _jax

    def kernel(a_ref, b_ref, mu_ref, q_ref, cw_ref, o_ref, prod_ref):
        a = a_ref[:, 0]
        b = b_ref[:, 0]
        mu, q, cw = mu_ref[...], q_ref[...], cw_ref[...]
        x = _mont_mul_arr(a, b, prod_ref, mu, q, cw)
        for _ in range(depth - 1):
            x = _mont_mul_arr(x, b, prod_ref, mu, q, cw)
        o_ref[:, 0] = x

    def run(a_blocks, b_blocks):
        nb = a_blocks.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[_FQ_SPEC, _FQ_SPEC] + _MUL_CONST_SPECS,
            out_specs=_FQ_SPEC,
            out_shape=jax.ShapeDtypeStruct((NL, nb, 8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((PROD, 8, 128), jnp.int32)],
            interpret=interpret,
        )(a_blocks, b_blocks, *_MUL_CONSTS)

    # jit: the ~2k-eq kernel jaxpr is traced ONCE per block count and
    # reused at every same-shape call site (an un-jitted pallas_call
    # re-traces the kernel per invocation — tracing dominated wall time
    # for programs with many call sites)
    return _jax.jit(run)


def mont_mul_pallas(a_blocks, b_blocks, interpret: bool = False):
    """(NL, NB, 8, 128) x same -> same; bit-equal to fq_mont.mont_mul."""
    return _build_mul(1, interpret)(a_blocks, b_blocks)


def mont_mul_chain_pallas(a_blocks, b_blocks, depth: int,
                          interpret: bool = False):
    """depth-deep chain x -> mont_mul(x, b), VMEM-resident throughout —
    the shape class the XLA backend miscompiles at >= 2^13 rows."""
    return _build_mul(depth, interpret)(a_blocks, b_blocks)


# --------------------------------------------------------------------------
# complete Jacobian point addition, fully fused
# --------------------------------------------------------------------------


def _point_add_kernel(
    x1_ref, y1_ref, z1_ref, i1_ref,
    x2_ref, y2_ref, z2_ref, i2_ref,
    mu_ref, q_ref, cw_ref, aw_ref, crtw_ref, crtp_ref, crtr_ref,
    x3_ref, y3_ref, z3_ref, i3_ref,
    prod_ref,
):
    """snark/tpu_msm.point_add (chord + tangent paths, data-independent
    selects) with every intermediate VMEM-resident: 17+ mont_muls, two
    exact mod-q equality tests, one kernel launch per 1024-point block."""
    X1, Y1, Z1 = x1_ref[:, 0], y1_ref[:, 0], z1_ref[:, 0]
    X2, Y2, Z2 = x2_ref[:, 0], y2_ref[:, 0], z2_ref[:, 0]
    inf1, inf2 = i1_ref[0], i2_ref[0]
    mu, q, cw = mu_ref[...], q_ref[...], cw_ref[...]
    eq_tabs = (q, aw_ref[...], crtw_ref[...], crtp_ref[...], crtr_ref[...])

    def mul(p, v):
        return _mont_mul_arr(p, v, prod_ref, mu, q, cw)

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = _sub_arr(U2, U1)
    HH = _dbl_arr(H)
    I = mul(HH, HH)
    J = mul(H, I)
    rr = _dbl_arr(_sub_arr(S2, S1))
    V = mul(U1, I)
    X3 = _sub_arr(_sub_arr(mul(rr, rr), J), _dbl_arr(V))
    Y3 = _sub_arr(mul(rr, _sub_arr(V, X3)), _dbl_arr(mul(S1, J)))
    Z3 = _dbl_arr(mul(mul(Z1, Z2), H))

    # doubling path (dbl-2007-bl on p1)
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    t = _add_arr(X1, B)
    t = mul(t, t)
    t = _sub_arr(_sub_arr(t, A), C)
    D = _dbl_arr(t)
    E = _add_arr(_dbl_arr(A), A)
    F = mul(E, E)
    Xd = _sub_arr(F, _dbl_arr(D))
    Yd = _sub_arr(mul(E, _sub_arr(D, Xd)), _dbl_arr(C, 3))
    Zd = _dbl_arr(mul(Y1, Z1))

    same_x = _eq_arr(U1, U2, *eq_tabs)
    same_y = _eq_arr(S1, S2, *eq_tabs)
    n1 = 1 - inf1
    n2 = 1 - inf2
    use_dbl = same_x * same_y * n1 * n2
    is_inf3 = jnp.minimum(
        same_x * (1 - same_y) * n1 * n2 + inf1 * inf2, 1
    )

    def sel(cond, a, b):
        return jnp.where(cond[None] == 1, a, b)

    X3 = sel(use_dbl, Xd, X3)
    Y3 = sel(use_dbl, Yd, Y3)
    Z3 = sel(use_dbl, Zd, Z3)
    X3 = sel(inf1, X2, sel(inf2, X1, X3))
    Y3 = sel(inf1, Y2, sel(inf2, Y1, Y3))
    Z3 = sel(inf1, Z2, sel(inf2, Z1, Z3))
    x3_ref[:, 0] = X3
    y3_ref[:, 0] = Y3
    z3_ref[:, 0] = Z3
    i3_ref[0] = is_inf3


def _point_add_aff_kernel(
    x1_ref, y1_ref, i1_ref,
    x2_ref, y2_ref, i2_ref,
    mu_ref, q_ref, cw_ref, aw_ref, crtw_ref, crtp_ref, crtr_ref,
    zone_ref,
    x3_ref, y3_ref, z3_ref, i3_ref,
    prod_ref,
):
    """Complete addition of two AFFINE points (implicit Z1 = Z2 = 1, the
    Montgomery one passed as a lane table): the MSM merge tree's level-1
    leaves.  Z=1 collapses the chord path to 6 mont_muls (I, J, V, rr^2,
    rr*(V-X3), Y1*J) and the tangent path to 6 (A, B, C, t^2, F,
    E*(D-Xd)) vs the generic kernel's 17+ — level 1 is HALF of all tree
    adds.  Output is ordinary Jacobian.  Same selects/infinity handling
    as _point_add_kernel.  Equality contract: intermediate LIMB
    REPRESENTATIVES differ from the generic kernel (the skipped
    by-one mont_muls re-relaxed their operands there), but every
    coordinate agrees in VALUE mod q and all selects are value-exact
    mod-q tests, so the final normalized MSM output is identical —
    the same relaxed-representation argument the whole limb pipeline
    rests on (ops/fq_mont.py)."""
    X1, Y1 = x1_ref[:, 0], y1_ref[:, 0]
    X2, Y2 = x2_ref[:, 0], y2_ref[:, 0]
    inf1, inf2 = i1_ref[0], i2_ref[0]
    mu, q, cw = mu_ref[...], q_ref[...], cw_ref[...]
    eq_tabs = (q, aw_ref[...], crtw_ref[...], crtp_ref[...], crtr_ref[...])
    one = zone_ref[...][:, None, :]  # (NL, 1, 128) -> broadcast rows

    def mul(p, v):
        return _mont_mul_arr(p, v, prod_ref, mu, q, cw)

    H = _sub_arr(X2, X1)
    HH = _dbl_arr(H)
    I = mul(HH, HH)
    J = mul(H, I)
    rr = _dbl_arr(_sub_arr(Y2, Y1))
    V = mul(X1, I)
    X3 = _sub_arr(_sub_arr(mul(rr, rr), J), _dbl_arr(V))
    Y3 = _sub_arr(mul(rr, _sub_arr(V, X3)), _dbl_arr(mul(Y1, J)))
    Z3 = _dbl_arr(H)

    # doubling path (dbl-2007-bl, Z1 = 1)
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    t = _add_arr(X1, B)
    t = mul(t, t)
    t = _sub_arr(_sub_arr(t, A), C)
    D = _dbl_arr(t)
    E = _add_arr(_dbl_arr(A), A)
    F = mul(E, E)
    Xd = _sub_arr(F, _dbl_arr(D))
    Yd = _sub_arr(mul(E, _sub_arr(D, Xd)), _dbl_arr(C, 3))
    Zd = _dbl_arr(Y1)

    same_x = _eq_arr(X1, X2, *eq_tabs)
    same_y = _eq_arr(Y1, Y2, *eq_tabs)
    n1 = 1 - inf1
    n2 = 1 - inf2
    use_dbl = same_x * same_y * n1 * n2
    is_inf3 = jnp.minimum(
        same_x * (1 - same_y) * n1 * n2 + inf1 * inf2, 1
    )

    def sel(cond, a, b):
        return jnp.where(cond[None] == 1, a, b)

    onz = jnp.broadcast_to(one, Z3.shape)
    X3 = sel(use_dbl, Xd, X3)
    Y3 = sel(use_dbl, Yd, Y3)
    Z3 = sel(use_dbl, Zd, Z3)
    X3 = sel(inf1, X2, sel(inf2, X1, X3))
    Y3 = sel(inf1, Y2, sel(inf2, Y1, Y3))
    Z3 = sel(inf1, onz, sel(inf2, onz, Z3))
    x3_ref[:, 0] = X3
    y3_ref[:, 0] = Y3
    z3_ref[:, 0] = Z3
    i3_ref[0] = is_inf3


def _build_point_add_aff(interpret: bool = False):
    return _build_point_add_aff_cached(interpret or FORCE_INTERPRET)


@functools.lru_cache(maxsize=None)
def _build_point_add_aff_cached(interpret: bool):
    import jax as _jax

    def run(p1, p2):
        x1, y1, f1 = p1
        x2, y2, f2 = p2
        nb = x1.shape[1]
        fq_shape = jax.ShapeDtypeStruct((NL, nb, 8, 128), jnp.int32)
        fl_shape = jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32)
        return pl.pallas_call(
            _point_add_aff_kernel,
            grid=(nb,),
            in_specs=[_FQ_SPEC, _FQ_SPEC, _FL_SPEC] * 2
            + _MUL_CONST_SPECS + _EQ_CONST_SPECS
            + [_const_spec(_ZONE_TAB.shape)],
            out_specs=[_FQ_SPEC, _FQ_SPEC, _FQ_SPEC, _FL_SPEC],
            out_shape=[fq_shape, fq_shape, fq_shape, fl_shape],
            scratch_shapes=[pltpu.VMEM((PROD, 8, 128), jnp.int32)],
            interpret=interpret,
        )(x1, y1, f1, x2, y2, f2, *_MUL_CONSTS, *_EQ_CONSTS, _ZONE_TAB)

    return _jax.jit(run)


def point_add_aff_pallas(p1, p2, interpret: bool = False):
    """Complete add of two AFFINE block-layout points: p = (X, Y, inf)
    with X/Y (NL, NB, 8, 128) int32 canonical Montgomery limbs and inf
    (NB, 8, 128) int32 0/1.  Returns Jacobian (X, Y, Z, inf) blocks.
    VALUE-equal (mod q per coordinate; identical normalized points) to
    point_add_pallas with canonical-one Z planes — see the kernel
    docstring for the representative-equality contract."""
    return _build_point_add_aff(interpret)(p1, p2)


def _build_point_add(interpret: bool = False):
    return _build_point_add_cached(interpret or FORCE_INTERPRET)


@functools.lru_cache(maxsize=None)
def _build_point_add_cached(interpret: bool):
    import jax as _jax

    def run(p1, p2):
        x1, y1, z1, f1 = p1
        x2, y2, z2, f2 = p2
        nb = x1.shape[1]
        fq_shape = jax.ShapeDtypeStruct((NL, nb, 8, 128), jnp.int32)
        fl_shape = jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32)
        return pl.pallas_call(
            _point_add_kernel,
            grid=(nb,),
            in_specs=[_FQ_SPEC, _FQ_SPEC, _FQ_SPEC, _FL_SPEC] * 2
            + _MUL_CONST_SPECS + _EQ_CONST_SPECS,
            out_specs=[_FQ_SPEC, _FQ_SPEC, _FQ_SPEC, _FL_SPEC],
            out_shape=[fq_shape, fq_shape, fq_shape, fl_shape],
            scratch_shapes=[pltpu.VMEM((PROD, 8, 128), jnp.int32)],
            interpret=interpret,
        )(x1, y1, z1, f1, x2, y2, z2, f2, *_MUL_CONSTS, *_EQ_CONSTS)

    # jit: as for _build_mul — the ~2k-op point_add kernel jaxpr is
    # traced ONCE per block count instead of once per call site.  The
    # wide-tree MSM (snark/tpu_msm_blocks.py) has ~40 call sites over
    # ~14 distinct block counts; un-jitted, tracing them dominated the
    # program's multi-minute cold build (round 5 measurement).
    return _jax.jit(run)


def point_add_pallas(p1, p2, interpret: bool = False):
    """Complete Jacobian add on block-layout points: p = (X, Y, Z, inf)
    with X/Y/Z (NL, NB, 8, 128) int32 and inf (NB, 8, 128) int32 0/1.
    Bit-equal to snark/tpu_msm.point_add (tests/test_pallas_fq.py)."""
    return _build_point_add(interpret)(p1, p2)
