"""G1 multi-scalar multiplication on TPU (the Groth16 prover's hot loop).

Pippenger over jax primitives, built on the batched Montgomery Fq limb
arithmetic in ops/fq_mont.py:

  per 12-bit window:  sort points by bucket digit  ->  WORK-EFFICIENT
  reduce-by-key (`_bucket_reduce`): a binary merge tree over the sorted
  run costing exactly ONE complete-Jacobian point_add per merge (n-1
  adds total) whose per-merge "bridge" sum closes the segment spanning
  the merge boundary; every bucket's total is scattered exactly once,
  at the unique merge where both its ends become interior  ->  chunked
  serial suffix scans (`_weighted_bucket_sum`, ~3*nb adds) for the
  classic  sum_d d*B_d = sum of suffix sums  identity  ->  fold the 22
  windows with 12 doublings between them.

An earlier revision used Hillis-Steele segmented scans for both phases;
those are log-depth but WORK-INEFFICIENT — n*log2(n) point adds per
window (2.2M at n=2^17 vs the tree's 131k) plus nb*log2(nb) for the
bucket phase — a ~17x work inflation over host Pippenger that the tree
removes.  All control flow remains data-independent (sorts, strided
slices, where-selects, drop-mode scatters), so the whole MSM compiles
to one XLA program per (n, window).  Sharding the point axis
batch-splits the MSM across a mesh (`g1_msm_tpu_sharded`).

Montgomery-domain conversion of the input points runs ON DEVICE (one
`to_mont` mul per coordinate inside the jit); the host side is pure
vectorized numpy bit-slicing of the u64 limb arrays — no Python bigint
loops at prover scale.

Measured tradeoff (ENGINEERING.md "TPU MSM"; round-4 refresh): at the
falcon-512 h_query shape (n_pad = 2^17, the batched-Groth16 K-fold
shape) the POST-MITIGATION end-to-end MSM runs at ~12.9 s/MSM ~ 3.6 M
modmul/s wall (K = 2..4 identical per-MSM; the pre-mitigation 7.9 M
figure measured the bare Montgomery core before the chunked-shape fix
paid its ~2x adds) vs 190-230 ms/MSM for the 4-core IFMA C backend —
the default prover therefore keeps the C backend (the measured policy
in snark/backend_policy.py), and this module is the
correctness-validated scale-out path (differentially tested:
tests/test_tpu_msm.py).  A single dispatch is also WATCHDOG-bounded:
K x n_pad lane-dispatches are capped per jit call because ~103 s
device programs reproducibly crash the tunneled worker
(g1_msm_tpu_multi chunks K across dispatches; probe-and-clamp below).
The VMEM-resident Pallas point kernels (ops/pallas_fq.py) are the
round-4/5 path past the HBM-bound XLA formulation: `use_pallas=True`
(the default when the Mosaic capability probe passes) runs the
limb-major wide-tree engine (snark/tpu_msm_blocks.py) at
**0.185 s/MSM device-profiled** for the same shape — ~70x the XLA
path, inside the host C's own 157-190 ms range (ENGINEERING.md
"The Pallas MSM optimization ladder").
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops import fq_mont as fq
from .bls12_381 import P as Q381, R as FR_R

WINDOW = 12
NW = (255 + WINDOW - 1) // WINDOW  # 22


_sub_mod = fq.sub_mod


def _dbl_small(a, times=1):
    out = a
    for _ in range(times):
        out = fq.add_mod(out, out)
    return out


def _eq(a, b):
    """Value equality of two relaxed limb reps (representations are not
    unique — limb-wise comparison would miss equal values)."""
    return fq.eq_mod_q(a, b)


def point_double(pt):
    """Jacobian doubling (dbl-2007-bl); pt = (X, Y, Z, inf)."""
    X, Y, Z, inf = pt
    mul = fq.mont_mul
    A = mul(X, X)
    B = mul(Y, Y)
    C = mul(B, B)
    t = fq.add_mod(X, B)
    t = mul(t, t)
    t = _sub_mod(_sub_mod(t, A), C)
    D = _dbl_small(t)
    E = fq.add_mod(_dbl_small(A), A)
    F = mul(E, E)
    X3 = _sub_mod(F, _dbl_small(D))
    Y3 = _sub_mod(mul(E, _sub_mod(D, X3)), _dbl_small(C, 3))
    Z3 = _dbl_small(mul(Y, Z))
    return (X3, Y3, Z3, inf)


def point_add(p1, p2):
    """Complete Jacobian addition: the generic chord and the tangent
    (doubling) paths are both evaluated and the correct one selected —
    data-independent control flow for XLA."""
    import jax.numpy as jnp

    X1, Y1, Z1, inf1 = p1
    X2, Y2, Z2, inf2 = p2
    mul = fq.mont_mul
    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = _sub_mod(U2, U1)
    HH = _dbl_small(H)
    I = mul(HH, HH)
    J = mul(H, I)
    rr = _dbl_small(_sub_mod(S2, S1))
    V = mul(U1, I)
    X3 = _sub_mod(_sub_mod(mul(rr, rr), J), _dbl_small(V))
    Y3 = _sub_mod(mul(rr, _sub_mod(V, X3)), _dbl_small(mul(S1, J)))
    Z3 = _dbl_small(mul(mul(Z1, Z2), H))

    same_x = _eq(U1, U2)
    same_y = _eq(S1, S2)
    dbl = point_double(p1)
    use_dbl = same_x & same_y & ~inf1 & ~inf2
    is_inf3 = (same_x & ~same_y & ~inf1 & ~inf2) | (inf1 & inf2)

    def sel(cond, a, b):
        return jnp.where(cond[..., None], a, b)

    X3 = sel(use_dbl, dbl[0], X3)
    Y3 = sel(use_dbl, dbl[1], Y3)
    Z3 = sel(use_dbl, dbl[2], Z3)
    X3 = sel(inf1, X2, sel(inf2, X1, X3))
    Y3 = sel(inf1, Y2, sel(inf2, Y1, Y3))
    Z3 = sel(inf1, Z2, sel(inf2, Z1, Z3))
    return (X3, Y3, Z3, is_inf3)


# pad/dispatch threshold for the fused kernel: 1 = EVERY point_add in a
# pallas program runs the VMEM kernel (padded to one 1024-point block).
# Measured at n_pad=2^17: 1.56 s/MSM at threshold 1 vs 2.09 s at 1024 —
# the sub-1024 tree tails and the weighted-sum scan steps are sequential
# small adds where even a padded kernel call beats the XLA point_add.
_PALLAS_MIN_ROWS = 1


def _point_add_rows_pallas(p1, p2):
    """point_add via the fused VMEM kernel (ops/pallas_fq.py) for points
    in row layout with ANY leading shape: flatten, pad to a 1024
    multiple with infinities, block-transpose, one kernel launch per
    1024-point block, convert back.  Bit-equal to the XLA point_add
    (same arithmetic; tests/test_pallas_fq.py + test_tpu_msm.py); at
    the measured 26.8 M adds/s the layout conversions (~1.1 KB/point of
    HBM traffic) cost ~4% of the add itself."""
    import jax.numpy as jnp

    from ..ops import pallas_fq as pfq

    lead = p1[0].shape[:-1]
    m = 1
    for d in lead:
        m *= d
    mp = ((m + pfq.BLK - 1) // pfq.BLK) * pfq.BLK

    def prep(pt):
        x, y, z, f = pt
        x = x.reshape(m, fq.NL)
        y = y.reshape(m, fq.NL)
        z = z.reshape(m, fq.NL)
        f = f.reshape(m)
        if mp != m:
            padc = jnp.zeros((mp - m, fq.NL), jnp.int32)
            x = jnp.concatenate([x, padc], axis=0)
            y = jnp.concatenate([y, padc], axis=0)
            z = jnp.concatenate([z, padc], axis=0)
            f = jnp.concatenate(
                [f, jnp.ones((mp - m,), f.dtype)], axis=0
            )
        return (
            pfq.to_blocks(x), pfq.to_blocks(y), pfq.to_blocks(z),
            pfq.flags_to_blocks(f),
        )

    ox, oy, oz, of = pfq.point_add_pallas(prep(p1), prep(p2))
    ox = pfq.from_blocks(ox)[:m].reshape(lead + (fq.NL,))
    oy = pfq.from_blocks(oy)[:m].reshape(lead + (fq.NL,))
    oz = pfq.from_blocks(oz)[:m].reshape(lead + (fq.NL,))
    of = pfq.flags_from_blocks(of)[:m].reshape(lead)
    return (ox, oy, oz, of)


def _make_add(pallas: bool):
    """The add implementation for one MSM program: XLA everywhere, or
    the fused Pallas kernel for every add whose (static) flattened size
    reaches a kernel block — small tree tails and scan carries stay XLA
    (they are far below the miscompile cliff and below kernel-padding
    efficiency)."""
    if not pallas:
        return point_add

    def add(p1, p2):
        m = 1
        for d in p1[0].shape[:-1]:
            m *= d
        if m >= _PALLAS_MIN_ROWS:
            return _point_add_rows_pallas(p1, p2)
        return point_add(p1, p2)

    return add


def _sel_pt(cond, a, b):
    """Pointwise select between two point tuples by a (m,) bool."""
    import jax.numpy as jnp

    return (
        jnp.where(cond[..., None], a[0], b[0]),
        jnp.where(cond[..., None], a[1], b[1]),
        jnp.where(cond[..., None], a[2], b[2]),
        jnp.where(cond, a[3], b[3]),
    )


def _scatter_pt(bufs, key, val, valid, nb: int):
    """Write point rows into the dense bucket arrays; invalid rows are
    redirected out of range and dropped (each bucket is written at most
    once across the whole reduction, so plain set scatters suffice)."""
    import jax.numpy as jnp

    bx, by, bz, binf = bufs
    idx = jnp.where(valid, key, nb).astype(jnp.int32)
    vx, vy, vz, vinf = val
    bx = bx.at[idx].set(vx, mode="drop")
    by = by.at[idx].set(vy, mode="drop")
    bz = bz.at[idx].set(vz, mode="drop")
    binf = binf.at[idx].set(vinf, mode="drop")
    return (bx, by, bz, binf)


def _bucket_reduce(pt, keys, nb: int, add=point_add):
    """Dense bucket sums of a KEY-SORTED point run, in n-1 point adds.

    Binary merge tree.  Each node summarizes a contiguous range by
    (H, T, kf, kl): the sum of its first segment, the sum of its last
    segment, and the first/last keys (sortedness makes kf == kl imply a
    single-segment node, so H == T == total there).  Merging left|right
    costs exactly one point_add — bridge = T_left + H_right, the sum of
    the segment spanning the boundary; every other combination reduces
    to a select on it:

      merged.H = (left single-segment and bridge same-key) ? bridge : left.H
      merged.T = (right single-segment and same-key) ? bridge : right.T

    A segment's total is EMITTED (scattered to its bucket) at the unique
    merge where both its ends become interior: the bridged segment when
    neither side is single-segment, the left tail / right head when the
    boundary keys differ; the root's H and T segments are emitted last.
    Each bucket is therefore written at most once, so the scatters are
    plain last-write sets with drop-mode masking.

    Work: exactly one point_add per merge at halving widths — n-1 adds
    total, vs n*log2(n) for a segmented Hillis-Steele scan.
    """
    import jax.numpy as jnp

    bufs = (
        jnp.zeros((nb, fq.NL), jnp.int32),
        jnp.zeros((nb, fq.NL), jnp.int32),
        jnp.zeros((nb, fq.NL), jnp.int32),
        jnp.ones((nb,), bool),
    )
    H = T = pt
    kf = kl = keys
    m = keys.shape[0]
    assert m & (m - 1) == 0, "_bucket_reduce requires power-of-two length"
    while m > 1:
        lH = tuple(a[0::2] for a in H)
        rH = tuple(a[1::2] for a in H)
        lT = tuple(a[0::2] for a in T)
        rT = tuple(a[1::2] for a in T)
        lkf, rkf = kf[0::2], kf[1::2]
        lkl, rkl = kl[0::2], kl[1::2]
        bridge = add(lT, rH)
        same = lkl == rkf
        ls = lkf == lkl  # left node spans a single segment
        rs = rkf == rkl
        H = _sel_pt(same & ls, bridge, lH)
        T = _sel_pt(same & rs, bridge, rT)
        # left-tail/bridged segment: complete unless it still touches an
        # edge of the merged node ( ~ls rules out the left edge; same&rs
        # would extend it to the right edge)
        valA = _sel_pt(same, bridge, lT)
        bufs = _scatter_pt(bufs, lkl, valA, ~ls & ~(same & rs), nb)
        # right-head segment: its left end becomes interior here; it is
        # complete iff it already ended inside the right node
        bufs = _scatter_pt(bufs, rkf, rH, ~same & ~rs, nb)
        kf, kl = lkf, rkl
        m //= 2
    bufs = _scatter_pt(bufs, kf, H, jnp.ones((1,), bool), nb)
    bufs = _scatter_pt(bufs, kl, T, kl != kf, nb)
    return bufs


def _tree_sum(pt, add=point_add):
    """Fold a (power-of-two) leading axis by pairwise point_add.  Works
    at any rank: leaves are (m, ..., NL) coords + (m, ...) inf flags."""
    m = pt[0].shape[0]
    assert m & (m - 1) == 0, "_tree_sum requires power-of-two length"
    while m > 1:
        pt = add(
            tuple(a[0::2] for a in pt), tuple(a[1::2] for a in pt)
        )
        m //= 2
    return pt


def _weighted_bucket_sum_parallel(bufs, nb: int, add):
    """sum_d d*B_d as ONE log-depth Hillis-Steele inclusive prefix over
    the reversed bucket order (prefix[i] = S_{nb-1-i}) plus a pairwise
    tree: ~2*log2(nb) WIDE adds total, vs the serial form's C + R
    sequential steps.  Work-inefficient (nb*log2(nb) adds vs ~3*nb) but
    every add is an nb-wide fused-kernel call, so on the Pallas path the
    critical-path collapse wins by far (the serial form spent most of
    the MSM in ~128 small sequential steps per window)."""
    import jax.numpy as jnp

    bx, by, bz, binf = bufs
    pt = (bx[:0:-1], by[:0:-1], bz[:0:-1], binf[:0:-1])  # buckets nb-1..1
    L = nb - 1
    P2 = 1 << max(1, (L - 1).bit_length())

    def pad_end(x, count, fill):
        f = jnp.full((count,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, f], axis=0)

    pt = (
        pad_end(pt[0], P2 - L, 0), pad_end(pt[1], P2 - L, 0),
        pad_end(pt[2], P2 - L, 0), pad_end(pt[3], P2 - L, True),
    )
    s = 1
    while s < P2:
        shifted = (
            jnp.concatenate([pt[0][:s] * 0, pt[0][: P2 - s]], axis=0),
            jnp.concatenate([pt[1][:s] * 0, pt[1][: P2 - s]], axis=0),
            jnp.concatenate([pt[2][:s] * 0, pt[2][: P2 - s]], axis=0),
            jnp.concatenate(
                [pt[3][:s] | True, pt[3][: P2 - s]], axis=0
            ),
        )
        pt = add(pt, shifted)
        s <<= 1
    live = jnp.arange(P2) < L
    pt = (pt[0], pt[1], pt[2], pt[3] | ~live)
    tot = _tree_sum(pt, add)
    return tuple(t[0] for t in tot)


def _weighted_bucket_sum(bufs, nb: int, add=point_add,
                         parallel_scan: bool = False):
    """sum_{d>=1} d * B_d  =  sum_{t>=1} S_t  with  S_t = sum_{d>=t} B_d.

    The suffix prefix-sums S over buckets nb-1..1 run as chunked serial
    scans (work-efficient: ~3*nb point adds total, vs nb*log2(nb) twice
    for scan-based suffixing): an inclusive lax.scan across C columns at
    width R (rows = chunks of the reversed bucket order), an exclusive
    width-1 scan over the R row totals, then one wide add to combine and
    a pairwise tree for the final total.  parallel_scan=True (the Pallas
    path) switches to the log-depth wide form above."""
    if parallel_scan:
        return _weighted_bucket_sum_parallel(bufs, nb, add)
    import jax
    import jax.numpy as jnp

    bx, by, bz, binf = bufs
    rev = (bx[:0:-1], by[:0:-1], bz[:0:-1], binf[:0:-1])  # buckets nb-1..1
    L = nb - 1
    bits = max(2, (L - 1).bit_length())
    cb = (bits + 1) // 2
    C = 1 << cb
    R = 1 << (bits - cb)
    pad = R * C - L

    def padded(x, fill):
        f = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, f], axis=0)

    arr = (
        padded(rev[0], 0), padded(rev[1], 0), padded(rev[2], 0),
        padded(rev[3], True),
    )
    # flattened index i = r*C + c; scan over columns at width R
    cols = tuple(
        jnp.moveaxis(x.reshape((R, C) + x.shape[1:]), 1, 0) for x in arr
    )

    def step(acc, col):
        acc = add(acc, col)
        return acc, acc

    # identity carries derived from the data (not fresh constants) so the
    # varying-manual-axis tag survives under shard_map
    def inf_like(pt):
        return (pt[0] * 0, pt[1] * 0, pt[2] * 0, pt[3] | True)

    _, P = jax.lax.scan(step, inf_like(tuple(c[0] for c in cols)), cols)
    rowtot = tuple(t[-1] for t in P)  # P: (C, R, ...)

    def step2(acc, row):
        return add(acc, row), acc

    rows = tuple(t[:, None] for t in rowtot)  # (R, 1, ...)
    _, offs = jax.lax.scan(
        step2, inf_like(tuple(r[0] for r in rows)), rows
    )  # exclusive
    # combine in (R, C, ...) form — never a rank-2 tensor wider than R*C
    # rows (the TPU backend miscompiles those past 2^12, see _SAFE_ROWS)
    offs_rc = tuple(
        jnp.broadcast_to(t, (R, C) + t.shape[2:]) for t in offs
    )
    P_rc = tuple(jnp.moveaxis(t, 0, 1) for t in P)
    S = add(offs_rc, P_rc)
    live = (jnp.arange(R * C) < L).reshape(R, C)
    S = (S[0], S[1], S[2], S[3] | ~live)
    tot = _tree_sum(S, add)  # (1, C, ...)
    tot = _tree_sum(tuple(t[0] for t in tot), add)  # (1, ...)
    return tuple(t[0] for t in tot)


# The refreshed TPU backend (jax 0.9.0 / libtpu 0.0.34) MISCOMPILES
# chained limb products on rank-2 tensors whose LEADING axis is >= 2^13:
# depth-1 mont_mul is exact at any width, but a depth-2 chain (and hence
# point_add) returns deterministic garbage from (8192, 35) inputs, on
# both the int8-MXU and the pure-VPU product paths, while the identical
# program is exact on the CPU backend and on this same TPU at 4096 rows
# (tools/tpu_mm_chain_bisect.py, tools/tpu_mm_variants.py).  Reshaping
# to (nc, 4096, 35) and vmapping is exact at the same total size
# (measured through (4, 4096, 35)), so every point-pipeline tensor here
# is kept in chunked 3-D form with the row axis capped at _SAFE_ROWS:
# per-chunk sort + bucket reduction (chunk-parallel under vmap), then a
# pairwise tree over the chunk axis merges the dense per-chunk bucket
# buffers (complete addition law, so split segments and padding
# infinities fold correctly).  Extra work vs the flat pipeline:
# (nc-1)*nb adds per window — ~2x total adds at n=2^16/window=12 —
# paid only above 4096 points.
_SAFE_ROWS = 4096


def _bucket_chunked(dg, X, Y, Z, inf, nb: int, gc: int, add=point_add):
    """Dense bucket sums over chunked points: dg (nc, S) digits,
    X/Y/Z (nc, S, NL), inf (nc, S) -> (nb, NL)-coord bucket buffers.

    Chunks run gc at a time (lax.map over groups, vmap inside) to bound
    the sort/scatter temps; the (nc, nb) per-chunk buffers then fold
    down the chunk axis with a pairwise point_add tree."""
    import jax

    nc = dg.shape[0]

    def one_chunk(dgc, xc, yc, zc, ic):
        import jax.numpy as jnp

        order = jnp.argsort(dgc)
        d = dgc[order]
        pt = (xc[order], yc[order], zc[order], ic[order] | (d == 0))
        return _bucket_reduce(pt, d, nb, add)

    if nc == gc:
        bufs = jax.vmap(one_chunk)(dg, X, Y, Z, inf)
    else:
        grp = tuple(
            t.reshape((nc // gc, gc) + t.shape[1:])
            for t in (dg, X, Y, Z, inf)
        )
        bufs = jax.lax.map(lambda g: jax.vmap(one_chunk)(*g), grp)
        bufs = tuple(t.reshape((nc,) + t.shape[2:]) for t in bufs)
    return tuple(t[0] for t in _tree_sum(bufs, add))


@functools.lru_cache(maxsize=None)
def _msm_jit(n: int, window: int = WINDOW, pallas: bool = False):
    import jax
    import jax.numpy as jnp

    assert not pallas, (
        "the wide-tree Pallas engine is dispatched by g1_msm_tpu via "
        "tpu_msm_blocks.g1_msm_blocks (round 5: premont cache + host "
        "fold changed its calling convention)"
    )
    nb = 1 << window
    nw = (255 + window - 1) // window
    # Mosaic is unaffected by the 8192-row XLA miscompile, so the pallas
    # program runs the FLAT merge tree (no chunk mitigation, ~2x fewer
    # adds); the XLA program keeps the chunked-shape form.
    S = n if pallas else min(n, _SAFE_ROWS)
    nc = n // S
    gc = max(1, min(nc, _MULTI_LANE_BUDGET // S))
    gc = 1 << (gc.bit_length() - 1)
    add = _make_add(pallas)

    def one_window(carry, digits):
        X, Y, Z, inf = carry
        bufs = _bucket_chunked(digits, X, Y, Z, inf, nb, gc, add)
        wsum = _weighted_bucket_sum(bufs, nb, add, parallel_scan=pallas)
        return (X, Y, Z, inf), wsum

    def msm(digits_all, Xs, Ys, inf):
        # standard-form canonical limbs -> Montgomery domain, on device,
        # already in safe chunked (nc, S, NL) form
        X = fq.to_mont(Xs.reshape(nc, S, fq.NL))
        Y = fq.to_mont(Ys.reshape(nc, S, fq.NL))
        Z = jnp.broadcast_to(jnp.asarray(_Z_ONE), X.shape)
        _, wsums = jax.lax.scan(
            one_window, (X, Y, Z, inf.reshape(nc, S)),
            digits_all.reshape(nw, nc, S),
        )  # wsums leaves: (nw, ...), window w ascending
        # Horner fold, high window first: total = (total * 2^window) + w_sum.
        # One point_double + one point_add in the graph (scan/fori_loop),
        # not nw*window unrolled copies — keeps the XLA program small.
        total0 = tuple(x[nw - 1][None] for x in wsums)
        rest = tuple(x[nw - 2 :: -1] for x in wsums)

        def fold(total, nxt):
            total = jax.lax.fori_loop(
                0, window, lambda _, p: point_double(p), total
            )
            nxt = tuple(t[None] for t in nxt)
            return point_add(total, nxt), None

        total, _ = jax.lax.scan(fold, total0, rest)
        return tuple(t[0] for t in total)

    return jax.jit(msm)


# HBM lane budget for the K-fold MSM: kc simultaneous lanes of n_pad
# points each.  Peak HLO-temp is ~4 G per 2^16 lanes (measured: K=4 x
# n_pad=2^16 hit 15.9 G on the 16 G v5e), so 2^17 lanes ~ 8 G leaves
# headroom for the sort/scatter temps.
_MULTI_LANE_BUDGET = 1 << 17
# max K*n_pad lanes per DISPATCH (watchdog bound, not memory — see
# g1_msm_tpu_multi): 2^19 ~ 4 MSM-equivalents at the falcon-512 h_query
# shape ~ 52 s device time on the chunked-XLA path, measured safe; 8
# equivalents crashed twice.
_MAX_DISPATCH_LANES = 1 << 19
# the wide-tree Pallas engine runs well under 1 s/MSM at 2^17 (~20x
# the XLA path), so its watchdog-safe dispatch is much larger; 2^21 ~
# 16 MSM-equivalents ~ 10-16 s device time (round 5: the lax.map group
# loop keeps the compiled program size K-independent)
_MAX_DISPATCH_LANES_PALLAS = 1 << 21

# --- dispatch watchdog: probe-and-clamp (round 5, VERDICT r4 #8) ------
#
# A single jit dispatch whose DEVICE time reaches ~103 s reproducibly
# crashes this tunneled worker, while ~52 s is safe (ENGINEERING.md
# "The ~100 s dispatch watchdog").  The two _MAX_DISPATCH_LANES
# constants above encode that envelope as measured on THIS tunnel; on
# different hardware the safe envelope may differ silently.  The cap is
# therefore derived, whenever a real dispatch has been timed, from a
# measured lanes-per-second rate times a configured device-seconds
# budget — the empirical constants remain as priors, and the derived
# cap is clamped to [prior/4, prior*4] so one mismeasured probe can
# never produce a crash-capable dispatch.  Env overrides:
#   FALCON_R1CS_TPU_MAX_DISPATCH_LANES   hard cap, skips the probe
#   FALCON_R1CS_TPU_DISPATCH_BUDGET_S    device-seconds budget (50)
import os as _os

_DISPATCH_BUDGET_S = 50.0
# measured lanes/second per engine, recorded by g1_msm_tpu's timed
# dispatches (wall clock; the ~0.3 s tunnel round trip is <1% of any
# dispatch long enough to matter, and short dispatches are ignored)
_MEASURED_LANE_RATE: dict = {}


# (n_pad, window, pallas) triples that have dispatched at least once in
# this process — their next dispatch is warm (no compile in the timing)
_DISPATCHED: set = set()


def record_dispatch_rate(lanes: int, seconds: float, pallas: bool):
    """Feed one timed dispatch into the watchdog cap derivation.  Only
    dispatches long enough to dominate the tunnel round trip count; the
    slowest observed rate wins (conservative under drift)."""
    if seconds < 2.0:
        return
    rate = lanes / seconds
    prev = _MEASURED_LANE_RATE.get(pallas)
    _MEASURED_LANE_RATE[pallas] = rate if prev is None else min(prev, rate)


def max_dispatch_lanes(pallas: bool) -> int:
    """K*n_pad lanes allowed per jit dispatch: measured-rate x budget
    when a probe has run, the engine's empirical prior otherwise,
    always a power of two (the K-chunking arithmetic relies on it).
    Tested hermetically in tests/test_tpu_msm.py."""
    env = _os.environ.get("FALCON_R1CS_TPU_MAX_DISPATCH_LANES")
    if env:
        v = int(env)
        return 1 << max(1, v.bit_length() - 1)
    prior = _MAX_DISPATCH_LANES_PALLAS if pallas else _MAX_DISPATCH_LANES
    rate = _MEASURED_LANE_RATE.get(pallas)
    if rate is None:
        return prior
    budget = float(
        _os.environ.get("FALCON_R1CS_TPU_DISPATCH_BUDGET_S",
                        str(_DISPATCH_BUDGET_S))
    )
    cap = int(rate * budget)
    cap = 1 << max(1, cap.bit_length() - 1)  # floor to a power of two
    return max(prior // 4, min(prior * 4, cap))


@functools.lru_cache(maxsize=None)
def _msm_multi_jit(n: int, K: int, kc: int, window: int = WINDOW,
                   pallas: bool = False):
    """K MSMs over ONE point set (the batched Groth16 prove shape): the
    per-window sort/reduce pipeline vmapped over the K digit rows, with
    the point tensors closed over (uploaded and Montgomery-converted
    once).  Scalars differ per proof so the sort cannot amortize, but the
    point conversion, upload, and the elementwise modmul work batch into
    K-fold wider tensors (better VPU utilization than K dispatches).

    The K axis is evaluated kc lanes at a time (lax.map over K//kc
    groups, vmap inside) so peak HLO-temp memory scales with kc*n, not
    K*n — a full-width vmap at K=4 x 2^16 points overflowed the 16 G
    v5e HBM by 158 M."""
    import jax
    import jax.numpy as jnp

    assert not pallas, (
        "the wide-tree Pallas engine is dispatched by g1_msm_tpu_multi "
        "via tpu_msm_blocks.g1_msm_blocks_multi (round 5)"
    )
    assert K % kc == 0, (K, kc)
    nb = 1 << window
    nw = (255 + window - 1) // window
    S = n if pallas else min(n, _SAFE_ROWS)
    nc = n // S
    # kc digit lanes are vmapped over _bucket_chunked, so the chunk-group
    # width multiplies with kc; keep kc*gc*S within the lane budget
    # (power of two so the group reshape divides nc evenly)
    gc = max(1, min(nc, _MULTI_LANE_BUDGET // (S * kc)))
    gc = 1 << (gc.bit_length() - 1)
    add = _make_add(pallas)

    def msm_multi(digits_all, Xs, Ys, inf):
        # digits_all: (nw, K, n); points in safe chunked (nc, S, NL) form
        X = fq.to_mont(Xs.reshape(nc, S, fq.NL))
        Y = fq.to_mont(Ys.reshape(nc, S, fq.NL))
        Z = jnp.broadcast_to(jnp.asarray(_Z_ONE), X.shape)
        infc = inf.reshape(nc, S)

        def one_window_k(digits):
            bufs = _bucket_chunked(
                digits.reshape(nc, S), X, Y, Z, infc, nb, gc, add
            )
            return _weighted_bucket_sum(bufs, nb, add,
                                        parallel_scan=pallas)

        def one_window(carry, digits_w):  # digits_w: (K, n)
            grouped = digits_w.reshape(K // kc, kc, n)
            out = jax.lax.map(
                lambda g: jax.vmap(one_window_k)(g), grouped
            )
            out = tuple(x.reshape((K,) + x.shape[2:]) for x in out)
            return carry, out

        _, wsums = jax.lax.scan(one_window, 0, digits_all)
        # wsums leaves: (nw, K, ...); Horner fold broadcasts over K
        total0 = tuple(x[nw - 1] for x in wsums)
        rest = tuple(x[nw - 2 :: -1] for x in wsums)

        def fold(total, nxt):
            total = jax.lax.fori_loop(
                0, window, lambda _, p: point_double(p), total
            )
            return point_add(total, nxt), None

        total, _ = jax.lax.scan(fold, total0, rest)
        return total

    return jax.jit(msm_multi)


def g1_msm_tpu_multi(points, scalars_multi, window: int | None = None,
                     use_pallas: bool | None = None):
    """K MSMs over one G1Array; returns a list of K affine points / None.
    The K-fold retest shape of VERDICT r2 Next #1(b): same CRS points,
    (K, n) scalar matrix.  use_pallas as in g1_msm_tpu."""
    import jax.numpy as jnp

    from .points import G1Array, ints_to_limbs

    if window is None:
        window = WINDOW
    if use_pallas is None:
        from ..ops.pallas_support import resolve_backend

        use_pallas = resolve_backend(None)
    assert isinstance(points, G1Array)
    n = len(points)
    n_pad = max(8, 1 << (n - 1).bit_length())
    rows = []
    for sc in scalars_multi:
        if isinstance(sc, np.ndarray) and sc.dtype == np.uint64:
            rows.append(np.ascontiguousarray(sc))
        else:
            rows.append(ints_to_limbs([int(s) % FR_R for s in sc], 4))
    K = len(rows)
    # DISPATCH-TIME cap (round 4): one jit call's device time must stay
    # under the tunnel/runtime watchdog — K=8 x n_pad=2^17 (~103 s on a
    # v5e) reproducibly CRASHES the TPU worker ("kernel fault"), while
    # K=4 (~52 s) is fine.  Chunk the K axis across dispatches; the cap
    # derives from a measured per-lane rate when available (probe-and-
    # clamp, round 5) and the re-paid point upload/to_mont per dispatch
    # is noise next to the adds.
    lanes = max_dispatch_lanes(use_pallas)
    kd = max(1, lanes // n_pad)
    if K > kd:
        out = []
        for off in range(0, K, kd):
            chunk = rows[off : off + kd]
            chunk = chunk + [np.zeros_like(rows[0])] * (kd - len(chunk))
            got = g1_msm_tpu_multi(points, chunk, window, use_pallas)
            out.extend(got[: min(kd, K - off)])
        return out
    if use_pallas and points.inf.any():
        # wide-tree leaf infinity = digit 0 (see g1_msm_tpu)
        mask = points.inf.astype(bool)
        rows = [np.where(mask[:, None], np.uint64(0), r) for r in rows]
    kc = max(1, min(K, _MULTI_LANE_BUDGET // n_pad))
    K_run = K if use_pallas else ((K + kc - 1) // kc) * kc
    _dig = _window_digits_signed if use_pallas else _window_digits
    digits = np.stack(
        [_dig(r, window) for r in rows]
        + [np.zeros_like(_dig(rows[0], window))] * (K_run - K),
        axis=1,
    )  # (nw, K_run, n)
    if n_pad > n:
        digits = np.concatenate(
            [digits, np.zeros(digits.shape[:2] + (n_pad - n,), np.int32)],
            axis=2,
        )
    if use_pallas:
        from . import tpu_msm_blocks as tmb

        return tmb.g1_msm_blocks_multi(points, digits, n_pad, K, window)
    Xs, Ys, inf = _points_std_limbs(points, n_pad)
    ox, oy, oz, oinf = (
        np.asarray(t)
        for t in _msm_multi_jit(n_pad, K_run, kc, window, use_pallas)(
            jnp.asarray(digits), Xs, Ys, inf
        )
    )
    out = []
    for k in range(K):
        if bool(oinf[k]):
            out.append(None)
        else:
            out.append(_jac_mont_to_affine(ox[k], oy[k], oz[k]))
    return out


LIMB12 = 12
# (NL,) int32 limbs of 1 in the Montgomery domain (Jacobian Z of an
# affine input)
_Z_ONE = fq.int_to_limbs([fq.R_MONT % Q381])[0]


def _u64_rows_to_limb12(rows: np.ndarray, nl: int = None) -> np.ndarray:
    """(n, k) u64 little-endian -> (n, nl) int32 12-bit limbs.

    Pure vectorized bit-slicing — no Python bigints; with the on-device
    `to_mont`, this is the entire host cost of point preparation."""
    if nl is None:
        nl = fq.NL
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    n, k = rows.shape
    out = np.zeros((n, nl), dtype=np.int32)
    for l in range(nl):
        bit = LIMB12 * l
        i, r = divmod(bit, 64)
        if i >= k:
            break
        v = rows[:, i] >> np.uint64(r)
        if r + LIMB12 > 64 and i + 1 < k:
            v = v | (rows[:, i + 1] << np.uint64(64 - r))
        out[:, l] = (v & np.uint64((1 << LIMB12) - 1)).astype(np.int32)
    return out


def _window_digits(scalars_u64: np.ndarray, window: int = WINDOW) -> np.ndarray:
    """(n, 4) u64 -> (nw, n) int32 window digits (host side, vectorized)."""
    sc = np.ascontiguousarray(scalars_u64, dtype=np.uint64)
    nw = (255 + window - 1) // window
    out = np.zeros((nw, sc.shape[0]), dtype=np.int32)
    mask = np.uint64((1 << window) - 1)
    for w in range(nw):
        bit = w * window
        i, r = divmod(bit, 64)
        if i >= sc.shape[1]:
            break
        v = sc[:, i] >> np.uint64(r)
        if r + window > 64 and i + 1 < sc.shape[1]:
            v = v | (sc[:, i + 1] << np.uint64(64 - r))
        out[w] = (v & mask).astype(np.int32)
    return out


def _window_digits_signed(scalars_u64: np.ndarray,
                          window: int = WINDOW) -> np.ndarray:
    """Signed-digit recode for the wide-tree engine: digits in
    [-(2^(w-1)-1), 2^(w-1)] packed as  magnitude | (sign << w).

    Halves the bucket count (the weighted-sum phase scales with 2^w;
    the point cost of a sign is one elementwise Y negation on device).
    Standard carry recode: v = d + carry; v > 2^(w-1) emits v - 2^w
    and carries 1.  Scalars are < r < 2^255, so the top window absorbs
    the final carry (asserted)."""
    d = _window_digits(scalars_u64, window)
    half = 1 << (window - 1)
    full = 1 << window
    out = np.zeros_like(d)
    carry = np.zeros(d.shape[1], dtype=np.int32)
    for w in range(d.shape[0]):
        v = d[w] + carry
        neg = v > half
        carry = neg.astype(np.int32)
        sv = np.where(neg, v - full, v)
        out[w] = np.abs(sv) | (np.where(sv < 0, 1, 0) << window)
    if carry.any():
        raise ValueError("signed recode: top-window carry overflow")
    return out


def g1_msm_tpu(points, scalars, window: int | None = None,
               use_pallas: bool | None = None):
    """MSM over a points.G1Array; returns an affine point or None.
    Differentially tested against the native C backend.  `window` trades
    bucket-scan length (2^w) for window count (255/w); None uses the
    module default (12, the TPU sweet spot) — tests pass small windows
    to keep CPU runtime sane.  use_pallas: None resolves via the Mosaic
    capability probe; True routes every >= 1024-row point_add through
    the fused VMEM kernel (ops/pallas_fq.py) and runs the FLAT merge
    tree (no 8192-row chunk mitigation)."""
    import jax.numpy as jnp

    from .points import G1Array, ints_to_limbs

    if window is None:
        window = WINDOW
    if use_pallas is None:
        from ..ops.pallas_support import resolve_backend

        use_pallas = resolve_backend(None)
    assert isinstance(points, G1Array)
    n = len(points)
    # pad to the next power of two (infinity points, zero scalars): one
    # compiled graph serves every MSM size in a bucket, and the prover's
    # four different query lengths typically share one compile
    n_pad = max(8, 1 << (n - 1).bit_length())
    if isinstance(scalars, np.ndarray) and scalars.dtype == np.uint64:
        sc = np.ascontiguousarray(scalars)
    else:
        sc = ints_to_limbs([int(s) % FR_R for s in scalars], 4)
    if use_pallas and points.inf.any():
        # the wide-tree engine flags leaf infinities by digit == 0 alone
        # (an on-device inf gather cost 23 ms/MSM); zero their scalars
        sc = sc.copy()
        sc[points.inf.astype(bool)] = 0
    digits = (
        _window_digits_signed(sc, window) if use_pallas
        else _window_digits(sc, window)
    )
    if n_pad > n:
        digits = np.concatenate(
            [digits, np.zeros((digits.shape[0], n_pad - n), np.int32)], axis=1
        )
    import time as _time

    key = (n_pad, window, use_pallas)
    warm = key in _DISPATCHED
    t0 = _time.perf_counter()
    if use_pallas:
        from . import tpu_msm_blocks as tmb

        out = tmb.g1_msm_blocks(points, digits, n_pad, window)
        if warm:
            record_dispatch_rate(
                n_pad, _time.perf_counter() - t0, use_pallas
            )
        _DISPATCHED.add(key)
        return out

    Xs, Ys, inf = _points_std_limbs(points, n_pad)
    ox, oy, oz, oinf = (
        np.asarray(t)
        for t in _msm_jit(n_pad, window, use_pallas)(
            jnp.asarray(digits), Xs, Ys, inf
        )
    )
    # feed the watchdog probe (np.asarray synchronized the dispatch);
    # only warm calls count — a first call's wall time is compile-bound
    if warm:
        record_dispatch_rate(n_pad, _time.perf_counter() - t0, use_pallas)
    _DISPATCHED.add(key)
    if bool(oinf):
        return None
    return _jac_mont_to_affine(ox, oy, oz)


def warm_compile(n_pad: int, window: int | None = None,
                 use_pallas: bool | None = None):
    """Trace + lower + COMPILE the single-MSM program for (n_pad,
    window) without executing anything on the device.

    The wide-tree Pallas program's cold compile is long (minutes; the
    Mosaic kernel builds once per distinct block count) and runs on the
    compile service — compiling here costs zero device time, so a
    background thread/subprocess can overlap it with host work
    (bench.py start_msm_warm).  The compile also lands in the
    persistent compilation cache (JAX_COMPILATION_CACHE_DIR), making
    the next same-program jit call — even from another process — a
    cache hit.  Returns the compiled executable (callers normally
    discard it and let the ordinary g1_msm_tpu path hit the cache)."""
    import jax
    import jax.numpy as jnp

    if window is None:
        window = WINDOW
    if use_pallas is None:
        from ..ops.pallas_support import resolve_backend

        use_pallas = resolve_backend(None)
    nw = (255 + window - 1) // window
    if use_pallas:
        from . import tpu_msm_blocks as tmb

        f = tmb.msm_window_sums_jit(n_pad, nw, window)
        args = (
            jax.ShapeDtypeStruct((nw, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((fq.NL, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((fq.NL, n_pad), jnp.int32),
        )
        return f.lower(*args).compile()
    f = _msm_jit(n_pad, window, use_pallas)
    args = (
        jax.ShapeDtypeStruct((nw, n_pad), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, fq.NL), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, fq.NL), jnp.int32),
        jax.ShapeDtypeStruct((n_pad,), jnp.bool_),
    )
    return f.lower(*args).compile()


def _points_std_limbs(points, n_pad: int):
    """G1Array -> device 12-bit-limb standard-form coordinate tensors +
    infinity flags, padded to n_pad with identities.  Cached on the array
    object (a dict keyed by n_pad, so alternating paddings don't thrash):
    the prover reuses the same CRS queries for every proof, so the
    (vectorized, but O(n)) host bit-slicing runs once per key.

    Assumes the G1Array is IMMUTABLE after first use here (G1Array never
    mutates xs/ys/inf in place anywhere in this package); if a caller ever
    rewrites those arrays it must drop `_tpu_limb_cache` itself."""
    import jax.numpy as jnp

    cache = getattr(points, "_tpu_limb_cache", None)
    if cache is not None and n_pad in cache:
        return cache[n_pad]
    n = len(points)
    xs = _u64_rows_to_limb12(points.xs)
    ys = _u64_rows_to_limb12(points.ys)
    pad = np.zeros((n_pad - n, fq.NL), np.int32)
    Xs = jnp.asarray(np.concatenate([xs, pad], axis=0))
    Ys = jnp.asarray(np.concatenate([ys, pad], axis=0))
    inf = jnp.asarray(
        np.concatenate([points.inf.astype(bool), np.ones(n_pad - n, bool)])
    )
    out = (Xs, Ys, inf)
    try:
        if cache is None:
            cache = points._tpu_limb_cache = {}
        cache[n_pad] = out
    except AttributeError:
        pass
    return out


def _jac_mont_to_affine(ox, oy, oz):
    """Montgomery-limb Jacobian -> standard affine ints (host side)."""
    rinv = pow(fq.R_MONT, -1, Q381)
    xi = fq.limbs_to_int(ox) * rinv % Q381
    yi = fq.limbs_to_int(oy) * rinv % Q381
    zi = fq.limbs_to_int(oz) * rinv % Q381
    zinv = pow(zi, -1, Q381)
    zi2 = zinv * zinv % Q381
    return (xi * zi2 % Q381, yi * zi2 % Q381 * zinv % Q381)


def g1_msm_tpu_sharded(points, scalars, window: int | None = None,
                       devices=None):
    """Point-axis data-parallel MSM over a device mesh.

    Each device runs the full Pippenger core (`_msm_jit`) on its local
    slice of the (padded) point/scalar arrays under shard_map — no
    cross-device communication until the D per-shard partial sums, which
    are folded on the host with the pure-Python group law.  Validated
    sharded-vs-single on an 8-device virtual mesh
    (tests/test_tpu_msm.py::test_msm_sharded_matches_single).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from .bls12_381 import g1_add, g1_from_affine, g1_to_affine
    from .points import G1Array, ints_to_limbs

    if window is None:
        window = WINDOW
    assert isinstance(points, G1Array)
    if devices is None:
        devices = jax.devices()
    D = len(devices)
    n = len(points)
    nw = (255 + window - 1) // window
    # pad so every shard is a power of two >= 8
    per = max(8, 1 << ((n + D - 1) // D - 1).bit_length())
    n_pad = per * D
    if isinstance(scalars, np.ndarray) and scalars.dtype == np.uint64:
        sc = np.ascontiguousarray(scalars)
    else:
        sc = ints_to_limbs([int(s) % FR_R for s in scalars], 4)
    digits = _window_digits(sc, window)
    digits = np.concatenate(
        [digits, np.zeros((nw, n_pad - n), np.int32)], axis=1
    )
    Xs, Ys, inf = _points_std_limbs(points, n_pad)

    mesh = Mesh(np.asarray(devices), ("pts",))
    core = _msm_jit(per, window)

    def shard_body(dg, x, y, nf):
        px, py, pz, pinf = core(dg, x, y, nf)
        return px[None], py[None], pz[None], pinf[None]

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(None, "pts"), P("pts"), P("pts"), P("pts")),
        out_specs=(P("pts"), P("pts"), P("pts"), P("pts")),
    )
    pX, pY, pZ, pI = (
        np.asarray(t) for t in sharded(jnp.asarray(digits), Xs, Ys, inf)
    )
    acc = None
    for d in range(D):
        if bool(pI[d]):
            continue
        aff = _jac_mont_to_affine(pX[d], pY[d], pZ[d])
        acc = g1_add(acc, g1_from_affine(aff))
    return g1_to_affine(acc) if acc is not None else None
