"""Pallas limb-NTT v3 EXPERIMENT (tool-gated, not part of the package).

Whole-tensor butterflies with parallel semi-carries.  Kept under tools/
because the remote Mosaic compiler OOMs on this kernel shape (see
ENGINEERING.md); the fused fori/scratch kernel in
falcon_r1cs_tpu/ops/pallas_ntt.py is the production default.

Improvements over pallas_ntt.py (kept for reference/tests):
  * state is one (L=12, blk, n) tensor; each stage is ~13 whole-tensor ops
    (2 lane-rolls, elementwise mul/add/where, and a limb-axis shift) --
    no sequential carry chains and no dynamic ref indexing;
  * carries are propagated ONE position per semi-normalization round
    (x & 0xFFFF) + shift_up(x >> 16).  Limbs stay in [-3, 2^16 + 2], so
    limb*s always fits int32 and the redundant value is exact; with L=12
    (192 bits >> the 164-bit bound) the top limb never carries out;
  * the final exact normalization + divmod-by-q runs OUTSIDE the kernel in
    XLA (cheap single pass) on the semi-normalized output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from falcon_r1cs_tpu.params import FalconParams, get_params
from falcon_r1cs_tpu.ops.limbs import LIMB_BITS, LIMB_MASK, divmod_q, normalize
from falcon_r1cs_tpu.ops.pallas_ntt import _stage_tables

V3_LIMBS = 12


def _make_kernel(params: FalconParams):
    n, log_n = params.n, params.log_n
    L = V3_LIMBS

    def semi_norm(x):
        low = jnp.bitwise_and(x, LIMB_MASK)
        carry = jnp.right_shift(x, LIMB_BITS)  # arithmetic: signed-safe
        shifted = jnp.concatenate(
            [jnp.zeros_like(carry[:1]), carry[:-1]], axis=0
        )
        return low + shifted

    def kernel(x_ref, tw_ref, lo_ref, bounds_ref, out_ref):
        x = x_ref[...]
        state = jnp.concatenate(
            [x[None], jnp.zeros((L - 1,) + x.shape, jnp.int32)], axis=0
        )
        for l in range(log_n):
            half = n >> (l + 1)
            s = tw_ref[l, :]
            lo = (lo_ref[l, :] == 1)[None, None, :]
            hi = jnp.where(lo, pltpu.roll(state, n - half, 2), state)
            u = jnp.where(lo, state, pltpu.roll(state, half, 2))
            v = semi_norm(hi * s)
            c = bounds_ref[l + 1]  # (L, 1, n): broadcasts, no reshape
            state = semi_norm(jnp.where(lo, u + v, u + (c - v)))
        out_ref[...] = state

    return kernel


@functools.lru_cache(maxsize=None)
def _build(n: int, block: int):
    params = get_params(n)
    tw, lo_mask, bounds = _stage_tables(params)
    # widen bound limbs to L=12 and pre-broadcast along n so the kernel can
    # slice (L, 1, n) without any reshape (Mosaic-unsupported)
    bounds = np.pad(bounds, ((0, 0), (0, V3_LIMBS - bounds.shape[1])))
    bounds_bcast = np.broadcast_to(
        bounds[:, :, None, None], bounds.shape + (1, n)
    ).copy()
    tw = jnp.asarray(tw)
    lo_mask = jnp.asarray(lo_mask)
    bounds_arr = jnp.asarray(bounds_bcast, dtype=jnp.int32)
    kernel = _make_kernel(params)

    def run(x):
        batch = x.shape[0]
        grid = (batch // block,)
        semi = pl.pallas_call(
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
                    (params.log_n + 1, V3_LIMBS, 1, n),
                    lambda i: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (V3_LIMBS, block, n),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (V3_LIMBS, batch, n), jnp.int32
            ),
        )(x, tw, lo_mask, bounds_arr)
        # exact final carry-normalization + divmod in XLA (single pass)
        t_limbs, b = divmod_q(normalize(semi))
        return t_limbs[:11], b  # engine layout uses 11 limbs

    return run


def ntt_with_hints_pallas_v3(x, params: FalconParams, block: int = 128):
    batch = x.shape[0]
    blk = min(block, batch)
    while batch % blk:
        blk //= 2
    return _build(params.n, blk)(x.astype(jnp.int32))
