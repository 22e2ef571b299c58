"""Pallas TPU kernel: the bound-tracked limb NTT, fused across all stages.

The XLA path (ops/ntt_limb.py) materializes the (L, B, n) limb tensor in
HBM between each of the log_n butterfly stages.  This kernel keeps a whole
batch-block's limb state resident in VMEM scratch across ALL stages plus
the final divmod, writing only the (t, b) outputs.

Butterfly formulation (Mosaic-friendly -- no lane-splitting reshapes):
at stage l with half = n >> (l+1), position j pairs with j +/- half inside
its group.  Two lane-rolls per limb give both butterfly operands in place:

    hi[j]  = x[j+half] if j is a "lo" slot else x[j]       (roll n-half)
    u[j]   = x[j]      if j is a "lo" slot else x[j-half]  (roll +half)
    v      = carry-normalize(hi * s[j])
    out[j] = u + v                 (lo slots)
             u + (bound_l - v)     (hi slots)

The limb axis is a STATICALLY UNROLLED sweep over VMEM scratch (carry
chains as Python-level values).  The per-stage active-limb schedule keeps
the unroll to ~65 iterations, small enough to compile in ~40 s cold; the
earlier fori_loop form indexed the scratch dynamically, which Mosaic
lowers to per-iteration address arithmetic — 26% slower.  Stage constants
live in SMEM; per-position twiddles and lo-slot masks are precomputed
host tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import FalconParams, Q, get_params
from .limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS, int_to_limbs

DEFAULT_BLOCK = 16  # batch rows per program: 16 measured best on v5e
# (0.610 ms/1024-batch vs 0.641 at 32 / 0.710 at 64 / 0.615 at 8 —
# smaller blocks trade grid overhead for VMEM locality and win)


def _stage_tables(params: FalconParams):
    """(log_n, n) per-position twiddles and lo-slot masks + bound limbs."""
    n, log_n = params.n, params.log_n
    table = np.asarray(params.ntt_table, dtype=np.int32)
    tw = np.zeros((log_n, n), dtype=np.int32)
    lo_mask = np.zeros((log_n, n), dtype=np.int32)
    j = np.arange(n)
    for l in range(log_n):
        m = 1 << l
        half = n >> (l + 1)
        group = j // (2 * half)
        tw[l] = table[m + group]
        lo_mask[l] = (j % (2 * half) < half).astype(np.int32)
    bounds = np.stack(
        [int_to_limbs(c, NUM_LIMBS) for c in params.const_q_powers]
    ).astype(np.int32)
    return tw, lo_mask, bounds


def _active_limbs(params: FalconParams):
    """Static per-stage active limb counts.

    After stage l every value is < const_q_powers[l+1] and the stage's
    intermediates (u + (c - v) before carry masking) are < 2x that, so
    only ceil((bits+2)/16) limb rows participate; the rows above stay
    exactly zero from initialization.  This cuts total limb-row work from
    log_n * L to sum(act) (~40% less for n=1024)."""
    log_n = params.log_n
    return [
        min(
            NUM_LIMBS,
            (params.const_q_powers[l + 1].bit_length() + 2 + LIMB_BITS - 1)
            // LIMB_BITS,
        )
        for l in range(log_n)
    ]


def _inv_stage_tables(params: FalconParams):
    """(log_n, n) per-position INVERSE twiddles for the in-kernel clear
    INTT prologue, premultiplied by 2^16 mod q (Montgomery domain: the
    in-kernel butterfly reduces products with a 16-bit integer Montgomery
    step, so mont(x * s') = x * s mod q exactly).  Row l serves the
    level-l inverse butterfly (the same lo/hi geometry as forward stage
    l, so lo_mask rows are shared)."""
    n, log_n = params.n, params.log_n
    table = np.asarray(params.inv_ntt_table, dtype=np.int64)
    itw = np.zeros((log_n, n), dtype=np.int32)
    j = np.arange(n)
    for l in range(log_n):
        m = 1 << l
        half = n >> (l + 1)
        group = j // (2 * half)
        itw[l] = (table[m + group] << 16) % Q
    return itw


# 16-bit Montgomery constants for the INTT prologue: QINV16 = -q^-1 mod
# 2^16, split into 8-bit halves so every in-kernel product stays < 2^24
# (no reliance on int32 wrap semantics)
_QINV16 = (-pow(Q, -1, 1 << 16)) % (1 << 16)
_QINV16_LO = _QINV16 & 0xFF
_QINV16_HI = _QINV16 >> 8


def _limb_sweep_divmod(
    st_ref, tw_ref, lo_ref, bounds_ref, t_ref, b_ref, zeros,
    n, log_n, act, L,
):
    """The forward bound-tracked limb NTT + final divmod, over a seeded
    VMEM scratch.  Shared by the plain hint kernel and the fused
    INTT-prologue kernel."""
    # STATIC limb sweep: every st_ref index is a compile-time
    # constant.  The earlier fori_loop form indexed the VMEM scratch
    # with the loop counter — dynamic ref indexing that Mosaic turns
    # into address arithmetic per iteration; unrolling it measured
    # 0.715 vs 0.965 ms per 1024-batch (26%), bit-identical.
    # sum(act) ~ 65 iterations keeps the jaxpr small enough that the
    # remote compiler stays ~40 s cold (cached thereafter).
    for l in range(log_n):
        half = n >> (l + 1)
        s = tw_ref[l, :]
        lo = (lo_ref[l, :] == 1)[None, :]

        # single merged pass per stage: the v chain (hi * s) and the
        # out chain (u + v / u + (c - v)) both run their limb carries
        # in the same k-sweep, reading each state row once
        cv = co = zeros
        for k in range(act[l]):
            sk = st_ref[k]
            hik = jnp.where(lo, pltpu.roll(sk, n - half, 1), sk)
            uk = jnp.where(lo, sk, pltpu.roll(sk, half, 1))
            tv = hik * s + cv
            vk = jnp.bitwise_and(tv, LIMB_MASK)
            ck = bounds_ref[l + 1, k]
            # uk hoisted out of the select: one vector add less
            to = uk + jnp.where(lo, vk, ck - vk) + co
            st_ref[k] = jnp.bitwise_and(to, LIMB_MASK)
            cv = jnp.right_shift(tv, LIMB_BITS)
            co = jnp.right_shift(to, LIMB_BITS)

    # divmod by q from the top limb; float-reciprocal divmod (exact
    # for cur < 2^30, same +-1-fixup argument as ops/modq.divmod_q,
    # inlined here with a Python-float reciprocal because pallas_call
    # rejects kernels capturing module-level jnp constants) instead
    # of `//`/`%`, which lower to a long-division loop per limb row
    inv_q = float(1.0 / Q)

    r = zeros
    for kk in range(L):
        k = L - 1 - kk
        cur = (r << LIMB_BITS) + st_ref[k]
        t = jnp.floor(cur.astype(jnp.float32) * inv_q).astype(jnp.int32)
        rem = cur - t * Q
        over = (rem >= Q).astype(jnp.int32)
        t = t + over
        rem = rem - over * Q
        under = (rem < 0).astype(jnp.int32)
        t_ref[k] = t - under
        r = rem + under * Q
    b_ref[...] = r


def _make_kernel(params: FalconParams):
    n, log_n = params.n, params.log_n
    L = NUM_LIMBS
    act = _active_limbs(params)

    def kernel(x_ref, tw_ref, lo_ref, bounds_ref, t_ref, b_ref, st_ref):
        zeros = jnp.zeros_like(x_ref[...])
        st_ref[0] = x_ref[...]
        for k in range(1, L):
            st_ref[k] = zeros
        _limb_sweep_divmod(
            st_ref, tw_ref, lo_ref, bounds_ref, t_ref, b_ref, zeros,
            n, log_n, act, L,
        )

    return kernel


def _make_kernel_vchain(params: FalconParams):
    """Kernel for the v derivation chain: w = (hm - sig_ntt*pk) mod q in
    the NTT domain goes in; a clear-int32 INTT runs as a VMEM-resident
    prologue (10 stages + the n^-1 scale, float-reciprocal mod-q), the
    result v is emitted as its own output, and the forward bound-tracked
    limb NTT + divmod produce v's (t, b) hint pair — one HBM read and
    one v write instead of the XLA INTT's log_n full round trips (~14%
    of engine device time at batch 1024, profile_engine)."""
    n, log_n = params.n, params.log_n
    L = NUM_LIMBS
    act = _active_limbs(params)
    n_inv = (pow(n, Q - 2, Q) << 16) % Q  # Montgomery-domain n^-1

    def kernel(w_ref, tw_ref, lo_ref, itw_ref, bounds_ref,
               t_ref, b_ref, v_ref, st_ref):
        def mont(p):
            # p in [0, 2^30.5) -> p * 2^-16 mod q, in [0, 2q).  Integer
            # Montgomery: m = (p mod 2^16) * (-q^-1) mod 2^16 via 8-bit
            # twiddle halves (all products < 2^24 — no int32 wrap needed),
            # then (p + m q) / 2^16 exactly.
            a = jnp.bitwise_and(p, 0xFFFF)
            m = jnp.bitwise_and(
                a * _QINV16_LO
                + (jnp.bitwise_and(a * _QINV16_HI, 0xFF) << 8),
                0xFFFF,
            )
            return jnp.right_shift(p + m * Q, 16)

        # clear INTT, levels log_n-1 .. 0 (falcon/ntt.intt_jax order);
        # level l shares forward stage l's lo/hi geometry, so lo_ref
        # rows are reused.  State stays LAZY in [0, 2q): the add path
        # folds with one conditional 2q subtract, the twiddle path
        # reduces with the integer Montgomery step against the 2^16-
        # premultiplied inverse twiddles (itw_ref) — no float divmod in
        # the loop.  Bounds: add < 4q -> [0, 2q); (u - vv + 2q) * s' <
        # 4q*q < 2^29.2; p + m*q < 2^30.5.
        x = w_ref[...]
        for l in range(log_n - 1, -1, -1):
            half = n >> (l + 1)
            s = itw_ref[l, :]
            lo = (lo_ref[l, :] == 1)[None, :]
            u = jnp.where(lo, x, pltpu.roll(x, half, 1))
            vv = jnp.where(lo, pltpu.roll(x, n - half, 1), x)
            add_ = u + vv                    # lo result, < 4q
            add_ = add_ - jnp.where(add_ >= 2 * Q, 2 * Q, 0)
            prod = (u - vv + 2 * Q) * s      # hi result
            x = jnp.where(lo, add_, mont(prod))
        # n^-1 scale (2^16-premultiplied) + canonicalization to [0, q)
        x = mont(x * n_inv)
        x = x - jnp.where(x >= Q, Q, 0)
        v_ref[...] = x

        zeros = jnp.zeros_like(x)
        st_ref[0] = x
        for k in range(1, L):
            st_ref[k] = zeros
        _limb_sweep_divmod(
            st_ref, tw_ref, lo_ref, bounds_ref, t_ref, b_ref, zeros,
            n, log_n, act, L,
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _build(n: int, block: int):
    params = get_params(n)
    # keep the tables as NUMPY in this (lru-cached) closure: converting to
    # jnp here would capture trace-time tracers when _build is first hit
    # inside a jit trace, leaking them into later traces via the cache
    tw, lo_mask, bounds_arr = _stage_tables(params)
    bounds_arr = np.asarray(bounds_arr, dtype=np.int32)
    kernel = _make_kernel(params)

    def run(x):
        batch = x.shape[0]
        grid = (batch // block,)
        t, b = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (params.log_n, n), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (params.log_n, n), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (params.log_n + 1, NUM_LIMBS), lambda i: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (NUM_LIMBS, block, n),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NUM_LIMBS, batch, n), jnp.int32),
                jax.ShapeDtypeStruct((batch, n), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((NUM_LIMBS, block, n), jnp.int32),
            ],
        )(x, tw, lo_mask, bounds_arr)
        return t, b

    return run


def ntt_with_hints_pallas(x, params: FalconParams, block: int = DEFAULT_BLOCK):
    """Drop-in replacement for ops.ntt_limb.ntt_with_hints using the fused
    Pallas kernel.  Batch is cut into the largest dividing block <= block."""
    batch = x.shape[0]
    blk = min(block, batch)
    while batch % blk:
        blk //= 2
    return _build(params.n, blk)(x.astype(jnp.int32))


@functools.lru_cache(maxsize=None)
def _build_vchain(n: int, block: int):
    params = get_params(n)
    tw, lo_mask, bounds_arr = _stage_tables(params)
    itw = _inv_stage_tables(params)
    bounds_arr = np.asarray(bounds_arr, dtype=np.int32)
    kernel = _make_kernel_vchain(params)

    def run(w):
        batch = w.shape[0]
        grid = (batch // block,)
        t, b, v = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (params.log_n, n), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (params.log_n, n), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (params.log_n, n), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (params.log_n + 1, NUM_LIMBS), lambda i: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (NUM_LIMBS, block, n),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NUM_LIMBS, batch, n), jnp.int32),
                jax.ShapeDtypeStruct((batch, n), jnp.int32),
                jax.ShapeDtypeStruct((batch, n), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((NUM_LIMBS, block, n), jnp.int32),
            ],
        )(w, tw, lo_mask, itw, bounds_arr)
        return t, b, v

    return run


def intt_ntt_hints_pallas(w, params: FalconParams,
                          block: int = DEFAULT_BLOCK):
    """Fused v-chain: (batch, n) NTT-domain w = (hm - sig_ntt*pk) mod q
    -> (v_t limbs, v_b, v) with the INTT as an in-kernel prologue."""
    batch = w.shape[0]
    blk = min(block, batch)
    while batch % blk:
        blk //= 2
    return _build_vchain(params.n, blk)(w.astype(jnp.int32))
