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


def _make_kernel(params: FalconParams):
    n, log_n = params.n, params.log_n
    L = NUM_LIMBS
    act = _active_limbs(params)

    def kernel(x_ref, tw_ref, lo_ref, bounds_ref, t_ref, b_ref, st_ref):
        zeros = jnp.zeros_like(x_ref[...])
        st_ref[0] = x_ref[...]
        for k in range(1, L):
            st_ref[k] = zeros

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
