"""Limb-major (transpose-free) Pallas MSM engine — the round-4 v2 path.

Profiling the first Pallas-integrated MSM (`tpu_msm._msm_jit(pallas=
True)`) showed the fused point kernels cost only ~2.5 ms of a 74 ms
window: ~60% of device time was row<->block LAYOUT CONVERSION and the
XLA pad/slice glue around every tree level (each `point_add` wrapper
transposed (m, 35) tensors to the kernel's limb-major block form and
back).  This module keeps the ENTIRE per-window pipeline in limb-major
form — coords (NL, m) int32, flags (m,) bool — so kernel calls are free
reshapes, and restructures the merge tree with a BIT-REVERSED leaf
placement:

    position p holds sorted element brev(p)

With that placement, the classic adjacent-pair merge becomes a
CONTIGUOUS-HALF merge at every level (left children = act[:, :c/2],
right = act[:, c/2:c], partner p <-> p + c/2 covering adjacent sorted
ranges — the Cooley-Tukey duality), so tree levels use plain slices
instead of the stride-2 deinterleaves that forced the transposes.  The
bit-reversal composes into the post-sort gather for free.

Everything else mirrors snark/tpu_msm.py: same H/T/kf/kl segment
bookkeeping, same single-scatter-per-bucket emission argument, same
log-depth weighted suffix sum, same Horner window fold.  Outputs are
differentially tested against the host backend and the row-layout path
(tests/test_tpu_msm.py).
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops import fq_mont as fq
from . import tpu_msm as tm


def _flat_add_factory():
    """Complete point_add on limb-major flat points ((NL, m) coords +
    (m,) bool flags): pad m to a kernel-block multiple, reshape (free —
    the flat layout IS the block layout's row-major order), one fused
    kernel call, slice back."""
    import jax.numpy as jnp

    from ..ops import pallas_fq as pfq

    def add(p1, p2):
        m = p1[0].shape[1]
        mp = ((m + pfq.BLK - 1) // pfq.BLK) * pfq.BLK
        nbk = mp // pfq.BLK

        def prep(pt):
            x, y, z, f = pt
            if mp != m:
                padc = jnp.zeros((fq.NL, mp - m), jnp.int32)
                x = jnp.concatenate([x, padc], axis=1)
                y = jnp.concatenate([y, padc], axis=1)
                z = jnp.concatenate([z, padc], axis=1)
                f = jnp.concatenate(
                    [f, jnp.ones((mp - m,), f.dtype)], axis=0
                )
            return (
                x.reshape(fq.NL, nbk, 8, 128),
                y.reshape(fq.NL, nbk, 8, 128),
                z.reshape(fq.NL, nbk, 8, 128),
                f.astype(jnp.int32).reshape(nbk, 8, 128),
            )

        ox, oy, oz, of = pfq.point_add_pallas(prep(p1), prep(p2))
        return (
            ox.reshape(fq.NL, mp)[:, :m],
            oy.reshape(fq.NL, mp)[:, :m],
            oz.reshape(fq.NL, mp)[:, :m],
            (of.reshape(mp) != 0)[:m],
        )

    return add


def _sel(cond, a, b):
    """Select between two flat point tuples by a (m,) bool."""
    import jax.numpy as jnp

    return (
        jnp.where(cond[None, :], a[0], b[0]),
        jnp.where(cond[None, :], a[1], b[1]),
        jnp.where(cond[None, :], a[2], b[2]),
        jnp.where(cond, a[3], b[3]),
    )


def _scatter(bufs, key, val, valid, nb: int):
    """Write flat point columns into the (NL, nb) bucket arrays."""
    import jax.numpy as jnp

    bx, by, bz, binf = bufs
    idx = jnp.where(valid, key, nb).astype(jnp.int32)
    bx = bx.at[:, idx].set(val[0], mode="drop")
    by = by.at[:, idx].set(val[1], mode="drop")
    bz = bz.at[:, idx].set(val[2], mode="drop")
    binf = binf.at[idx].set(val[3], mode="drop")
    return (bx, by, bz, binf)


def _bucket_reduce_flat(pt, keys, nb: int, add):
    """tpu_msm._bucket_reduce with bit-reversed placement: leaves must
    arrive with position p holding sorted element brev(p); merges then
    read CONTIGUOUS halves (left = [:c2], right = [c2:c], partner
    p <-> p + c2 covering adjacent sorted ranges)."""
    import jax.numpy as jnp

    n = keys.shape[0]
    assert n & (n - 1) == 0
    bufs = (
        jnp.zeros((fq.NL, nb), jnp.int32),
        jnp.zeros((fq.NL, nb), jnp.int32),
        jnp.zeros((fq.NL, nb), jnp.int32),
        jnp.ones((nb,), bool),
    )
    H = T = pt
    kf = kl = keys
    c = n
    while c > 1:
        c2 = c // 2
        lH = tuple(a[..., :c2] for a in H)
        rH = tuple(a[..., c2:c] for a in H)
        lT = tuple(a[..., :c2] for a in T)
        rT = tuple(a[..., c2:c] for a in T)
        lkf, rkf = kf[:c2], kf[c2:c]
        lkl, rkl = kl[:c2], kl[c2:c]
        bridge = add(lT, rH)
        same = lkl == rkf
        ls = lkf == lkl
        rs = rkf == rkl
        H = _sel(same & ls, bridge, lH)
        T = _sel(same & rs, bridge, rT)
        valA = _sel(same, bridge, lT)
        bufs = _scatter(bufs, lkl, valA, ~ls & ~(same & rs), nb)
        bufs = _scatter(bufs, rkf, rH, ~same & ~rs, nb)
        kf, kl = lkf, rkl
        c = c2
    bufs = _scatter(bufs, kf, H, jnp.ones((1,), bool), nb)
    bufs = _scatter(bufs, kl, T, kl != kf, nb)
    return bufs


def _tree_sum_flat(pt, add):
    c = pt[0].shape[-1]
    assert c & (c - 1) == 0
    while c > 1:
        c2 = c // 2
        pt = add(
            tuple(a[..., :c2] for a in pt),
            tuple(a[..., c2:c] for a in pt),
        )
        c = c2
    return pt


def _weighted_bucket_sum_flat(bufs, nb: int, add):
    """Log-depth Hillis-Steele suffix prefix + pairwise tree, limb-major
    (tpu_msm._weighted_bucket_sum_parallel in flat layout).  NOTE the
    pairing inside the tree is positional — fine, bucket order is
    irrelevant to the total."""
    import jax.numpy as jnp

    bx, by, bz, binf = bufs
    pt = (bx[:, :0:-1], by[:, :0:-1], bz[:, :0:-1], binf[:0:-1])
    L = nb - 1
    P2 = 1 << max(1, (L - 1).bit_length())

    def pad_end(x, fill):
        shp = x.shape[:-1] + (P2 - L,)
        return jnp.concatenate(
            [x, jnp.full(shp, fill, x.dtype)], axis=-1
        )

    pt = (
        pad_end(pt[0], 0), pad_end(pt[1], 0), pad_end(pt[2], 0),
        pad_end(pt[3], True),
    )
    s = 1
    while s < P2:
        shifted = (
            jnp.concatenate(
                [pt[0][:, :s] * 0, pt[0][:, : P2 - s]], axis=1
            ),
            jnp.concatenate(
                [pt[1][:, :s] * 0, pt[1][:, : P2 - s]], axis=1
            ),
            jnp.concatenate(
                [pt[2][:, :s] * 0, pt[2][:, : P2 - s]], axis=1
            ),
            jnp.concatenate([pt[3][:s] | True, pt[3][: P2 - s]], axis=0),
        )
        pt = add(pt, shifted)
        s <<= 1
    live = jnp.arange(P2) < L
    pt = (pt[0], pt[1], pt[2], pt[3] | ~live)
    return _tree_sum_flat(pt, add)


@functools.lru_cache(maxsize=None)
def _brev(n: int) -> np.ndarray:
    bits = (n - 1).bit_length()
    out = np.zeros(n, dtype=np.int32)
    for p in range(n):
        r = 0
        x = p
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[p] = r
    return out


@functools.lru_cache(maxsize=None)
def msm_jit_blocks(n: int, window: int):
    """jit-compiled limb-major Pallas MSM program for (n_pad, window)."""
    import jax
    import jax.numpy as jnp

    nb = 1 << window
    nw = (255 + window - 1) // window
    add = _flat_add_factory()
    brev = _brev(n)

    def msm(digits_all, Xs, Ys, inf):
        # to Montgomery in row layout (fq ops are limb-minor), then ONE
        # transpose into limb-major for the whole MSM
        Xm = jnp.transpose(fq.to_mont(Xs), (1, 0))  # (NL, n)
        Ym = jnp.transpose(fq.to_mont(Ys), (1, 0))
        Zm = jnp.broadcast_to(
            jnp.asarray(tm._Z_ONE)[:, None], (fq.NL, n)
        )
        brev_d = jnp.asarray(brev)

        def one_window(carry, digits):
            order = jnp.argsort(digits)
            idx = order[brev_d]  # sorted + bit-reversed placement
            d = digits[idx]
            pt = (
                Xm[:, idx], Ym[:, idx], Zm,
                inf[idx] | (d == 0),
            )
            bufs = _bucket_reduce_flat(pt, d, nb, add)
            wsum = _weighted_bucket_sum_flat(bufs, nb, add)
            return carry, wsum

        _, wsums = jax.lax.scan(one_window, 0, digits_all)
        # Horner fold in row layout (single points; XLA ops)
        def row(ptc, w):
            return tuple(
                jnp.transpose(t[w], (1, 0)) if t.ndim == 3 else t[w]
                for t in ptc
            )

        ws = tuple(wsums)  # coords (nw, NL, 1), inf (nw, 1)
        total = (
            jnp.transpose(ws[0][nw - 1], (1, 0)),
            jnp.transpose(ws[1][nw - 1], (1, 0)),
            jnp.transpose(ws[2][nw - 1], (1, 0)),
            ws[3][nw - 1],
        )
        rest = tuple(t[nw - 2 :: -1] for t in ws)

        def fold(tot, nxt):
            tot = jax.lax.fori_loop(
                0, window, lambda _, p: tm.point_double(p), tot
            )
            nxt_row = (
                jnp.transpose(nxt[0], (1, 0)),
                jnp.transpose(nxt[1], (1, 0)),
                jnp.transpose(nxt[2], (1, 0)),
                nxt[3],
            )
            return tm.point_add(tot, nxt_row), None

        total, _ = jax.lax.scan(fold, total, rest)
        return tuple(t[0] for t in total)

    return jax.jit(msm)
