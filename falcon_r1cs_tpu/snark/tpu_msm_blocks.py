"""Limb-major (transpose-free) Pallas MSM engine — the round-4 v2 path.

Profiling the first Pallas-integrated MSM (`tpu_msm._msm_jit(pallas=
True)`) showed the fused point kernels cost only ~2.5 ms of a 74 ms
window: ~60% of device time was row<->block LAYOUT CONVERSION and the
XLA pad/slice glue around every tree level (each `point_add` wrapper
transposed (m, 35) tensors to the kernel's limb-major block form and
back).  This module keeps the ENTIRE per-window pipeline in limb-major
form — coords (NL, ..., m) int32, flags (..., m) bool — so kernel calls
are free reshapes, and restructures the merge tree with a BIT-REVERSED
leaf placement:

    position p holds sorted element brev(p)

With that placement, the classic adjacent-pair merge becomes a
CONTIGUOUS-HALF merge at every level (left children = act[..., :c/2],
right = act[..., c/2:c], partner p <-> p + c/2 covering adjacent sorted
ranges — the Cooley-Tukey duality), so tree levels use plain slices
instead of the stride-2 deinterleaves that forced the transposes.  The
bit-reversal composes into the post-sort gather for free.

v3 (wide tree): the v2 engine still ran the 22 scalar windows serially
(`lax.scan`), so every tree level, select, and scatter executed 22
times at 1/22nd of the efficient width — and the deep tree levels
(width < a few thousand) were pure dispatch latency.  Here ALL windows
of a group ride a single tree: coords carry an explicit window axis
((NL, W, c)), every per-level add/select/scatter is W-fold wider, the
22 argsorts become one batched sort, and bucket keys scatter into a
single (NL, W*nb) buffer bank with a per-window offset.  Group size is
bounded by `_group_windows` purely for HBM headroom; windows in a
group share every level's kernel dispatch.

Everything else mirrors snark/tpu_msm.py: same H/T/kf/kl segment
bookkeeping, same single-scatter-per-bucket emission argument, same
log-depth weighted suffix sum.  Outputs are differentially tested
against the host backend and the row-layout path (tests/test_tpu_msm.py).

v4 (round 5, profile-driven — tools/profile_msm.py): the device program
is now ONLY the window sums.  Groups are serialized with lax.map (the
unrolled group loop OOMed at K=8: XLA overlaps independent groups'
560 MB gather temps), the digit sort is variadic (killing a 29 ms
element gather), leaf infinities ride digit==0 with host-zeroed scalars
(killing a 23 ms boolean gather), Montgomery conversion is a cached
prover-preprocessing step (`_points_mont`, killing ~22 ms of per-call
reshape copies), and the Horner window fold runs on the host in exact
bigints (killing 64 ms of serial (1, 35) point ops — 11% of the MSM).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..ops import fq_mont as fq
from . import tpu_msm as tm


def _flat_add_factory():
    """Complete point_add on limb-major flat points ((NL, ..., m) coords
    + (..., m) bool flags): flatten the batch axes, pad to a
    kernel-block multiple, reshape (free — the flat layout IS the block
    layout's row-major order), one fused kernel call, slice back."""
    import jax.numpy as jnp

    from ..ops import pallas_fq as pfq

    def add(p1, p2):
        shp = p1[3].shape  # batch shape, e.g. (W, c) or (c,)
        m = 1
        for s in shp:
            m *= s
        mp = ((m + pfq.BLK - 1) // pfq.BLK) * pfq.BLK
        nbk = mp // pfq.BLK

        def prep(pt):
            x, y, z, f = pt
            x = x.reshape(fq.NL, m)
            y = y.reshape(fq.NL, m)
            z = z.reshape(fq.NL, m)
            f = f.reshape(m)
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
            ox.reshape(fq.NL, mp)[:, :m].reshape((fq.NL,) + shp),
            oy.reshape(fq.NL, mp)[:, :m].reshape((fq.NL,) + shp),
            oz.reshape(fq.NL, mp)[:, :m].reshape((fq.NL,) + shp),
            (of.reshape(mp) != 0)[:m].reshape(shp),
        )

    return add


def _flat_aff_add_factory():
    """Complete point_add of two AFFINE flat points ((NL, ..., m) X/Y +
    (..., m) bool flags, implicit Z = one): the merge tree's level-1
    add — 12 mont_muls instead of the generic kernel's 17+ (level 1 is
    half of all tree adds).  Returns a Jacobian flat 4-tuple."""
    import jax.numpy as jnp

    from ..ops import pallas_fq as pfq

    def add(p1, p2):
        shp = p1[2].shape
        m = 1
        for s in shp:
            m *= s
        mp = ((m + pfq.BLK - 1) // pfq.BLK) * pfq.BLK
        nbk = mp // pfq.BLK

        def prep(pt):
            x, y, f = pt
            x = x.reshape(fq.NL, m)
            y = y.reshape(fq.NL, m)
            f = f.reshape(m)
            if mp != m:
                padc = jnp.zeros((fq.NL, mp - m), jnp.int32)
                x = jnp.concatenate([x, padc], axis=1)
                y = jnp.concatenate([y, padc], axis=1)
                f = jnp.concatenate(
                    [f, jnp.ones((mp - m,), f.dtype)], axis=0
                )
            return (
                x.reshape(fq.NL, nbk, 8, 128),
                y.reshape(fq.NL, nbk, 8, 128),
                f.astype(jnp.int32).reshape(nbk, 8, 128),
            )

        ox, oy, oz, of = pfq.point_add_aff_pallas(prep(p1), prep(p2))
        return (
            ox.reshape(fq.NL, mp)[:, :m].reshape((fq.NL,) + shp),
            oy.reshape(fq.NL, mp)[:, :m].reshape((fq.NL,) + shp),
            oz.reshape(fq.NL, mp)[:, :m].reshape((fq.NL,) + shp),
            (of.reshape(mp) != 0)[:m].reshape(shp),
        )

    return add


def _sel(cond, a, b):
    """Select between two flat point tuples by a (..., m) bool."""
    import jax.numpy as jnp

    return (
        jnp.where(cond[None], a[0], b[0]),
        jnp.where(cond[None], a[1], b[1]),
        jnp.where(cond[None], a[2], b[2]),
        jnp.where(cond, a[3], b[3]),
    )


def _bank_layout() -> str:
    """Bucket-bank memory layout (A/B-able on-chip; read at TRACE time —
    a process changing it must msm_window_sums_jit.cache_clear()):
    - "row" (default): one (W*nb + 1, 3*NL + 1) row-major bank; each
      emission is ONE scatter of 424-byte CONTIGUOUS rows (x|y|z limbs
      + inf), at the price of transposing the emitted values out of
      limb-major.  Measured on-chip (round 5): 0.417 -> 0.294 s/MSM at
      the 2^17 h_query shape, bit-equal — the four per-emission element
      scatters (~43 ms at the top level) became one row scatter
      (11.6 ms); element scatters run ~10 ns/element vs ~0.05 ns/element
      for contiguous-row moves.
    - "limb": the round-4 form — four (NL, W*nb) limb-major planes,
      four element scatters per emission (kept as the differential
      fallback; the hermetic multi-MSM lane pins it)."""
    return os.environ.get("FALCON_R1CS_TPU_MSM_BANK", "row")


def _scatter(bufs, key, val, valid, nb: int):
    """Write flat point columns into the bucket bank ("limb" planes or
    the "row" bank — see _bank_layout).

    `key` is (W, c) in [0, nb); each window's keys are offset into its
    own nb-wide slot so one scatter serves the whole group.  Invalid
    lanes are redirected one past the bank and dropped."""
    import jax.numpy as jnp

    W, c = key.shape
    off = (jnp.arange(W, dtype=jnp.int32) * nb)[:, None]
    idx = jnp.where(valid, key + off, W * nb).astype(jnp.int32).reshape(-1)
    if _bank_layout() == "row":
        m = idx.shape[0]
        rows = jnp.concatenate(
            [
                jnp.transpose(val[0].reshape(fq.NL, m), (1, 0)),
                jnp.transpose(val[1].reshape(fq.NL, m), (1, 0)),
                jnp.transpose(val[2].reshape(fq.NL, m), (1, 0)),
                val[3].reshape(m, 1).astype(jnp.int32),
            ],
            axis=1,
        )  # (m, 3*NL + 1)
        return bufs.at[idx].set(rows, mode="drop")
    bx, by, bz, binf = bufs
    bx = bx.at[:, idx].set(val[0].reshape(fq.NL, -1), mode="drop")
    by = by.at[:, idx].set(val[1].reshape(fq.NL, -1), mode="drop")
    bz = bz.at[:, idx].set(val[2].reshape(fq.NL, -1), mode="drop")
    binf = binf.at[idx].set(val[3].reshape(-1), mode="drop")
    return (bx, by, bz, binf)


def _bucket_reduce_flat(pt_aff, keys, nb: int, add, aff_add):
    """tpu_msm._bucket_reduce with bit-reversed placement and an
    explicit window axis: AFFINE leaves (X, Y (NL, W, n), flags
    (W, n)), keys (W, n).  Leaves must arrive with position p holding
    sorted element brev(p); merges then read CONTIGUOUS halves (left =
    [..., :c2], right = [..., c2:c], partner p <-> p + c2 covering
    adjacent sorted ranges).  All W windows share every level's kernel
    dispatch; returns the (NL, W*nb) bucket bank.

    Level 1 is special-cased (round 5): both operands are affine
    single-leaf nodes, so (a) the add runs the 12-mul affine kernel
    instead of the generic 17+-mul Jacobian kernel, (b) Jacobian Z is
    materialized only from half width on, and (c) the two emission
    scatters are SKIPPED outright — a level-1 node is single-segment
    (kf == kl), which makes every emission lane invalid; the generic
    loop was paying two full-width all-dropped scatters (~23 ms/MSM at
    the h_query shape) to write nothing."""
    import jax.numpy as jnp

    W, n = keys.shape
    assert n & (n - 1) == 0 and n >= 2
    if _bank_layout() == "row":
        # unwritten rows must read as infinity: inf column (3*NL) = 1
        bufs = jnp.zeros((W * nb + 1, 3 * fq.NL + 1), jnp.int32)
        bufs = bufs.at[:, 3 * fq.NL].set(1)
    else:
        bufs = (
            jnp.zeros((fq.NL, W * nb), jnp.int32),
            jnp.zeros((fq.NL, W * nb), jnp.int32),
            jnp.zeros((fq.NL, W * nb), jnp.int32),
            jnp.ones((W * nb,), bool),
        )
    # --- level 1: affine add, no emissions possible ---
    c2 = n // 2
    lk, rk = keys[..., :c2], keys[..., c2:]
    l_aff = tuple(a[..., :c2] for a in pt_aff)
    r_aff = tuple(a[..., c2:] for a in pt_aff)
    bridge = aff_add(l_aff, r_aff)
    same = lk == rk
    one = jnp.broadcast_to(
        jnp.asarray(tm._Z_ONE)[:, None, None], (fq.NL, W, c2)
    )
    H = _sel(same, bridge, (l_aff[0], l_aff[1], one, l_aff[2]))
    T = _sel(same, bridge, (r_aff[0], r_aff[1], one, r_aff[2]))
    kf, kl = lk, rk
    c = c2
    while c > 1:
        c2 = c // 2
        lH = tuple(a[..., :c2] for a in H)
        rH = tuple(a[..., c2:c] for a in H)
        lT = tuple(a[..., :c2] for a in T)
        rT = tuple(a[..., c2:c] for a in T)
        lkf, rkf = kf[..., :c2], kf[..., c2:c]
        lkl, rkl = kl[..., :c2], kl[..., c2:c]
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
    bufs = _scatter(bufs, kf, H, jnp.ones((W, 1), bool), nb)
    bufs = _scatter(bufs, kl, T, kl != kf, nb)
    if _bank_layout() == "row":
        # one transpose back to the limb-major planes the weighted-sum
        # phase consumes (12.6 MB per plane — noise)
        live = bufs[: W * nb]
        return (
            jnp.transpose(live[:, 0 : fq.NL], (1, 0)),
            jnp.transpose(live[:, fq.NL : 2 * fq.NL], (1, 0)),
            jnp.transpose(live[:, 2 * fq.NL : 3 * fq.NL], (1, 0)),
            live[:, 3 * fq.NL] != 0,
        )
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


def _hs_suffix_weighted(pt, nbk: int, add):
    """sum_{j>=1} j * X_j over the last axis of pt = (coords (NL, W,
    nbk), inf (W, nbk)) — Hillis-Steele suffix prefix over the reversed
    order (drops the weight-0 slot) plus a pairwise tree.  Returns
    coords (NL, W, 1) + inf (W, 1)."""
    import jax.numpy as jnp

    bx, by, bz, binf = pt
    pt = (bx[..., :0:-1], by[..., :0:-1], bz[..., :0:-1], binf[..., :0:-1])
    L = nbk - 1
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
                [pt[0][..., :s] * 0, pt[0][..., : P2 - s]], axis=-1
            ),
            jnp.concatenate(
                [pt[1][..., :s] * 0, pt[1][..., : P2 - s]], axis=-1
            ),
            jnp.concatenate(
                [pt[2][..., :s] * 0, pt[2][..., : P2 - s]], axis=-1
            ),
            jnp.concatenate(
                [pt[3][..., :s] | True, pt[3][..., : P2 - s]], axis=-1
            ),
        )
        pt = add(pt, shifted)
        s <<= 1
    live = jnp.arange(P2) < L
    pt = (pt[0], pt[1], pt[2], pt[3] | ~live[None, :])
    return _tree_sum_flat(pt, add)


def _wsum_mode(nb: int) -> str:
    """Weighted-sum strategy: "decomp" (default where applicable) or
    the legacy "hs" full-width Hillis-Steele (env
    FALCON_R1CS_TPU_WSUM=hs; also the automatic fallback when nb-1 is
    not a power of two >= 4).  Trace-time switch, as _bank_layout."""
    L = nb - 1
    if L < 4 or L & (L - 1):
        return "hs"
    return os.environ.get("FALCON_R1CS_TPU_WSUM", "decomp")


def wsum_weights(nb: int) -> list:
    """Static weights of the per-window part columns that
    _weighted_bucket_sum_flat returns (all powers of two; the host fold
    applies them as doublings): decomp mode [CL, 1, L], legacy [1]."""
    if _wsum_mode(nb) == "hs":
        return [1]
    L = nb - 1
    clb = (L.bit_length() - 1) // 2
    return [1 << clb, 1, L]


def _weighted_bucket_sum_flat(bufs, W: int, nb: int, add):
    """Per-window weighted bucket sums over the (NL, W*nb) bank.

    "decomp" (round 5): write bucket index d = CL*hi + lo (CL*CH =
    nb-1, the top bucket L = nb-1 handled as its own part) and use
      sum_d d*B_d = CL * sum_hi hi*C_hi + sum_lo lo*D_lo + L*B_L,
      C_hi = sum_lo B[hi, lo],  D_lo = sum_hi B[hi, lo]:
    two CONTIGUOUS-axis pairwise tree sums over the reshaped bank plus
    two tiny suffix scans over CH/CL values — ~110 kernel blocks vs the
    full-width Hillis-Steele's ~480 plus its 11 rounds of pad/shift
    concat copies.  The CL and L part weights are powers of two and are
    applied by the HOST fold as doublings (_fold_windows_host), so the
    device never runs tiny serial point ops.  Returns PART columns:
    coords (NL, W, P) + inf (W, P) with static weights wsum_weights(nb)
    ("hs" mode: P = 1, weight [1] — the legacy single total)."""
    import jax.numpy as jnp

    bx, by, bz, binf = bufs
    bx = bx.reshape(fq.NL, W, nb)
    by = by.reshape(fq.NL, W, nb)
    bz = bz.reshape(fq.NL, W, nb)
    binf = binf.reshape(W, nb)
    if _wsum_mode(nb) == "hs":
        return _hs_suffix_weighted((bx, by, bz, binf), nb, add)

    L = nb - 1
    clb = (L.bit_length() - 1) // 2
    CL = 1 << clb
    CH = L // CL
    body = (
        bx[..., :L].reshape(fq.NL, W, CH, CL),
        by[..., :L].reshape(fq.NL, W, CH, CL),
        bz[..., :L].reshape(fq.NL, W, CH, CL),
        binf[..., :L].reshape(W, CH, CL),
    )
    C = _tree_sum_flat(body, add)  # (NL, W, CH, 1): sum over lo
    C = tuple(t[..., 0] for t in C)
    Dsw = tuple(jnp.swapaxes(t, -1, -2) for t in body)
    D = _tree_sum_flat(Dsw, add)  # (NL, W, CL, 1): sum over hi
    D = tuple(t[..., 0] for t in D)
    S1 = _hs_suffix_weighted(C, CH, add)  # sum hi*C_hi
    S2 = _hs_suffix_weighted(D, CL, add)  # sum lo*D_lo
    top = (bx[..., L:], by[..., L:], bz[..., L:], binf[..., L:])
    return (
        jnp.concatenate([S1[0], S2[0], top[0]], axis=-1),
        jnp.concatenate([S1[1], S2[1], top[1]], axis=-1),
        jnp.concatenate([S1[2], S2[2], top[2]], axis=-1),
        jnp.concatenate([S1[3], S2[3], top[3]], axis=-1),
    )


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


def _group_windows(n: int, nw: int) -> int:
    """Windows per wide-tree group: bounded so one group's live tree
    tensors (~4 x 3 coords x NL x W x n int32 at the top level) stay
    within HBM headroom; FALCON_R1CS_TPU_MSM_GROUP overrides the cap.

    Returns the largest DIVISOR of nw within the cap: groups are
    equal-width so `_window_sums` can serialize them with lax.map —
    round-5 finding: a Python-level group loop does NOT bound HBM,
    because XLA overlaps independent groups' gather/tree temps (K=8 x
    2^17 OOMed with five 560 MB gather copies live at once), while
    lax.map keeps exactly one group's temps alive AND traces the
    (kernel-heavy) group body once regardless of K."""
    env = os.environ.get("FALCON_R1CS_TPU_MSM_GROUP")
    if env:
        cap = max(1, min(nw, int(env)))
    else:
        # ~18.4 MB per coord tensor per window at n=2^17; budget ~6 GB
        # of live top-level tree state on a 16 GB part
        per_w = 4 * 3 * fq.NL * n * 4
        cap = max(1, min(nw, int(6e9 // per_w)))
    for g in range(cap, 0, -1):
        if nw % g == 0:
            return g
    return 1


def _window_sums(digits_flat, Xm, Ym, n: int, window: int, add, aff_add,
                 G: int, brev_d):
    """Shared wide-tree core: per-window bucket-weighted sums.

    digits_flat (nW, n) int32, SIGNED-PACKED (magnitude | sign << w,
    tpu_msm._window_digits_signed) — any stack of scalar windows over
    ONE point set (a single MSM's nw windows, or K MSMs' nw*K); returns
    coords (NL, nW, 1) + inf (nW, 1).  Windows are processed G at a
    time (G | nW) under lax.map, which both bounds live HBM to ONE
    group's temps (XLA overlaps the temps of independent unrolled
    groups — the K=8 OOM) and traces the kernel-heavy group body once
    however many groups there are.

    Round-5 profile-driven glue cuts (tools/profile_msm.py on-chip):
    - VARIADIC sort: lax.sort carries the sign and position payloads
      with the MAGNITUDE keys, so sorted digits come out of the sort —
      the separate take_along_axis digit gather cost 29.4 ms/MSM
      (element gathers run ~10 ns/element vs ~0.05 ns/element for the
      140-byte-row coordinate gathers).
    - Leaf infinity = (magnitude == 0) alone: callers zero the scalars
      of infinity points on the host (g1_msm_tpu), killing a 23.2 ms
      boolean element gather.  Padding already has zero scalars.
    - SIGNED digits: buckets run 1..2^(w-1) instead of 1..2^w-1, so
      the weighted-sum phase (suffix scan over nb buckets) halves; a
      sign costs one elementwise Y negation at the leaves (a negated
      relaxed limb vector is a valid relaxed representation of -y —
      the same class point_add's own subtractions produce)."""
    import jax
    import jax.numpy as jnp

    nb = (1 << (window - 1)) + 1  # magnitudes 0..2^(w-1)
    nW = digits_flat.shape[0]
    assert nW % G == 0, (nW, G)
    mag = digits_flat & ((1 << window) - 1)
    sign = digits_flat >> window
    # one batched variadic sort + bit-reversed placement for ALL windows
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None], (nW, n)
    )
    d_sorted, s_sorted, order = jax.lax.sort(
        (mag, sign, iota), dimension=1, is_stable=True, num_keys=1
    )
    idx_all = order[:, brev_d]
    d_all = d_sorted[:, brev_d]
    s_all = s_sorted[:, brev_d]

    def group(args):
        idx, d, s = args  # (G, n)
        Yg = Ym[:, idx]
        Yg = jnp.where(s[None] == 1, -Yg, Yg)
        # AFFINE leaves (implicit Z = one): level 1 runs the 12-mul
        # affine kernel and skips its (always-empty) emission scatters
        pt = (Xm[:, idx], Yg, d == 0)
        bufs = _bucket_reduce_flat(pt, d, nb, add, aff_add)
        return _weighted_bucket_sum_flat(bufs, G, nb, add)

    ng = nW // G
    if ng == 1:
        return group((idx_all, d_all, s_all))
    gx, gy, gz, gi = jax.lax.map(
        group,
        (
            idx_all.reshape(ng, G, n),
            d_all.reshape(ng, G, n),
            s_all.reshape(ng, G, n),
        ),
    )
    # stacked (ng, NL, G, P) / (ng, G, P) -> (NL, nW, P) / (nW, P);
    # group-major order g*G + w matches the pre-map concatenation
    P = gx.shape[-1]
    return (
        jnp.moveaxis(gx, 0, 1).reshape(fq.NL, nW, P),
        jnp.moveaxis(gy, 0, 1).reshape(fq.NL, nW, P),
        jnp.moveaxis(gz, 0, 1).reshape(fq.NL, nW, P),
        gi.reshape(nW, P),
    )


@functools.lru_cache(maxsize=None)
def msm_window_sums_jit(n: int, nW: int, window: int):
    """The device program: digits (nW, n) int32 + Montgomery limb-major
    coords (NL, n) -> per-window bucket-weighted Jacobian PART sums
    ((NL, nW, P) coords + (nW, P) inf; static part weights
    wsum_weights).  One program serves both the single-MSM (nW = nw)
    and K-fold (nW = nw*K) shapes.

    Round 5 moved everything AROUND the window sums off the device:
    - Montgomery conversion is prover preprocessing (`_points_mont`
      caches the converted device tensors on the G1Array — the CRS
      points never change across proofs; the per-call to_mont +
      limb-major relayout cost ~22 ms/MSM of reshape copies on-chip).
    - The Horner window fold runs on the HOST in exact bigints
      (`_fold_windows_host`): on device it was 264 serial point_doubles
      on (1, 35) tensors — 64.5 ms/MSM of pure serial latency, ~11% of
      the whole MSM — vs low single-digit ms in Python."""
    import jax
    import jax.numpy as jnp

    add = _flat_add_factory()
    aff_add = _flat_aff_add_factory()
    brev = _brev(n)
    G = _group_windows(n, nW)

    def sums(digits_flat, Xm, Ym):
        return _window_sums(
            digits_flat, Xm, Ym, n, window, add, aff_add, G,
            jnp.asarray(brev)
        )

    return jax.jit(sums)


@functools.lru_cache(maxsize=None)
def _premont_jit():
    import jax
    import jax.numpy as jnp

    def conv(Xs, Ys):
        return (
            jnp.transpose(fq.to_mont(Xs), (1, 0)),
            jnp.transpose(fq.to_mont(Ys), (1, 0)),
        )

    return jax.jit(conv)


def _points_mont(points, n_pad: int):
    """Montgomery-domain limb-major (NL, n_pad) device coordinate
    tensors, cached on the G1Array like tpu_msm._points_std_limbs (the
    prover reuses the same CRS queries for every proof; same
    immutability contract)."""
    cache = getattr(points, "_tpu_mont_cache", None)
    if cache is not None and n_pad in cache:
        return cache[n_pad]
    Xs, Ys, _inf = tm._points_std_limbs(points, n_pad)
    out = _premont_jit()(Xs, Ys)
    try:
        if cache is None:
            cache = points._tpu_mont_cache = {}
        cache[n_pad] = out
    except AttributeError:
        pass
    return out


def _fold_windows_host(ws, nw: int, K: int, window: int):
    """Horner-fold the device per-window PART sums on the host, exactly:
    S_{w,k} = sum_p weight_p * part_{w,k,p} (weights are powers of two,
    wsum_weights — applied as doublings), then
    total_k = sum_w 2^(window*w) * S_{w,k}, all over Jacobian bigints
    (snark/bls12_381 group law).  Returns K affine tuples / None.
    Identical VALUE to an on-device fold (the group law is exact;
    Jacobian representatives differ, affine results cannot)."""
    from .bls12_381 import g1_add, g1_double, g1_to_affine

    nb = (1 << (window - 1)) + 1
    shifts = [wt.bit_length() - 1 for wt in wsum_weights(nb)]
    P = len(shifts)
    ox, oy, oz, oinf = (np.asarray(t) for t in ws)
    ox = ox.reshape(fq.NL, nw, K, P)
    oy = oy.reshape(fq.NL, nw, K, P)
    oz = oz.reshape(fq.NL, nw, K, P)
    oinf = oinf.reshape(nw, K, P)
    rinv = pow(fq.R_MONT, -1, tm.Q381)
    out = []
    for k in range(K):
        total = None
        for w in range(nw - 1, -1, -1):
            if total is not None:
                for _ in range(window):
                    total = g1_double(total)
            for p in range(P):
                if bool(oinf[w, k, p]):
                    continue
                pt = (
                    fq.limbs_to_int(ox[:, w, k, p]) * rinv % tm.Q381,
                    fq.limbs_to_int(oy[:, w, k, p]) * rinv % tm.Q381,
                    fq.limbs_to_int(oz[:, w, k, p]) * rinv % tm.Q381,
                )
                for _ in range(shifts[p]):
                    pt = g1_double(pt)
                total = g1_add(total, pt)
        out.append(g1_to_affine(total) if total is not None else None)
    return out


def g1_msm_blocks(points, digits, n_pad: int, window: int):
    """Single MSM through the wide tree: digits (nw, n_pad) int32 with
    infinity points' scalars already zeroed (g1_msm_tpu does this).
    Returns an affine point or None."""
    import jax.numpy as jnp

    Xm, Ym = _points_mont(points, n_pad)
    nw = digits.shape[0]
    ws = msm_window_sums_jit(n_pad, nw, window)(
        jnp.asarray(digits), Xm, Ym
    )
    return _fold_windows_host(ws, nw, 1, window)[0]


def g1_msm_blocks_multi(points, digits_all, n_pad: int, K: int,
                        window: int):
    """K MSMs over one point set: digits_all (nw, K, n_pad) int32,
    flattened w-major so all K*nw windows ride one group loop.
    Returns a list of K affine points / None."""
    import jax.numpy as jnp

    Xm, Ym = _points_mont(points, n_pad)
    nw = digits_all.shape[0]
    flat = digits_all.reshape(nw * K, n_pad)
    ws = msm_window_sums_jit(n_pad, nw * K, window)(
        jnp.asarray(flat), Xm, Ym
    )
    return _fold_windows_host(ws, nw, K, window)
