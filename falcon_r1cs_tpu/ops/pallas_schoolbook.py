"""Pallas TPU kernel: the schoolbook circuit's n x n product block.

The schoolbook witness engine's dominant cost is the (B, n, n) negacyclic
product tensor — every product is a mul wire — plus its exact 38-bit row
sums (quotient hints).  The XLA formulation pays three ~B*n*n*4-byte HBM
passes: the Toeplitz gather materializes `cols` as a copy, the producer
fusion writes `prods` while reducing one 16-bit half, and the other half
re-reads `prods` (profile in BASELINE.md).  XLA refuses to fuse the
gather into its consumer or both reductions into the producer (tried:
block-partial int32 sums and a variadic two-output lax.reduce — both
SLOWER, 7.5/5.8 ms vs 5.1 ms at B=128, n=1024).

This kernel streams instead: the sliding Toeplitz window lives in VMEM
scratch and advances by ONE STATIC LANE-ROLL per row (row i needs
buf[n-1-i+j], so consecutive rows differ by a single rotation — no
gather at all), products are written once, and both 16-bit half-sums
reduce in-register in the same pass.  One ~B*n*n*4-byte HBM write total:
2.05 ms vs 5.11 ms measured (B=128, n=1024, v5e) — 2.5x.

Grid: (B/8, n/128); each step emits 128 rows for 8 batch rows (the
(8, 128) output tile is the minimal legal Mosaic tiling for the (B, n)
sum outputs).  The scratch persists across the row-axis grid steps
(Pallas TPU grids iterate sequentially, last axis fastest).

Bit-exactness: H/L are the unique base-2^16 split of the exact row sum,
identical to the XLA engine's per-element split accumulation; parity is
asserted against the host trace in tests/test_witness_engines_all.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Q

_BB = 8     # batch rows per block (minimal sublane tile)
_R = 128    # rows emitted per grid step (minimal lane tile for H/L)


def _make_kernel(n: int):
    def kernel(sig_ref, buf0_ref, prods_ref, h_ref, l_ref, state_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            state_ref[...] = buf0_ref[...]

        st = state_ref[...]
        s = sig_ref[...]
        # incremental single-lane rolls: row r's window is row r-1's
        # advanced by one, so each row costs a shift-by-1 instead of an
        # arbitrary-distance roll(st, r) — 2.04 -> 1.50 ms per 128-batch
        # measured (bit-equal).  Storing the advanced window back also
        # replaces the old explicit roll-by-_R between grid steps.
        w = st
        for r in range(_R):
            row = s * w[:, :n]                                # (BB, n)
            prods_ref[:, r, :] = row
            lo = jnp.sum(jnp.bitwise_and(row, 0xFFFF), axis=-1)
            hi = jnp.sum(jnp.right_shift(row, 16), axis=-1)
            h_ref[:, r] = hi + jnp.right_shift(lo, 16)
            l_ref[:, r] = jnp.bitwise_and(lo, 0xFFFF)
            w = pltpu.roll(w, 1, 1)
        state_ref[...] = w

    return kernel


@functools.lru_cache(maxsize=None)
def _build(n: int):
    kernel = _make_kernel(n)

    def run(sig, buf0):
        batch = sig.shape[0]
        grid = (batch // _BB, n // _R)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BB, n), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BB, 2 * n), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_BB, _R, n), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BB, _R), lambda b, i: (b, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BB, _R), lambda b, i: (b, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, n, n), jnp.int32),
                jax.ShapeDtypeStruct((batch, n), jnp.int32),
                jax.ShapeDtypeStruct((batch, n), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((_BB, 2 * n), jnp.int32)],
        )(sig, buf0)

    return run


def schoolbook_prods_pallas(sig, pk, n: int):
    """(B, n) sig x (B, n) pk -> (prods (B, n, n), H (B, n), L (B, n)).

    prods[b,i,j] = sig[b,j] * buf[b, n-1-i+j] with buf = reversed
    [q - pk || pk]; (H, L) is the exact base-2^16 split of each row sum.
    Batch is padded to a multiple of 8 (kernel tile) and sliced back.
    """
    batch = sig.shape[0]
    pad = (-batch) % _BB
    if pad:
        sig = jnp.concatenate(
            [sig, jnp.zeros((pad, n), sig.dtype)], axis=0
        )
        pk = jnp.concatenate([pk, jnp.zeros((pad, n), pk.dtype)], axis=0)
    buf = jnp.flip(jnp.concatenate([Q - pk, pk], axis=-1), axis=-1)
    # state_0[j] = buf[n-1+j (mod 2n)] — the row-0 window, pre-rotated
    buf0 = jnp.concatenate([buf[:, n - 1:], buf[:, : n - 1]], axis=-1)
    prods, H, L = _build(n)(sig.astype(jnp.int32), buf0)
    if pad:
        prods, H, L = prods[:batch], H[:batch], L[:batch]
    return prods, H, L
