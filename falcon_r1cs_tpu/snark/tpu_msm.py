"""G1 multi-scalar multiplication on TPU (the Groth16 prover's hot loop).

Pippenger over jax primitives, built on the batched Montgomery Fq limb
arithmetic in ops/fq_mont.py:

  per 12-bit window:  sort points by bucket digit  ->  SEGMENTED
  inclusive scan (Hillis-Steele over log2(n) lax.scan steps; the combine
  op is the complete Jacobian group law) so each bucket's sum lands on
  its segment end  ->  scatter ends into the dense bucket array  ->
  suffix scan + total (the classic  sum_d d*B_d = sum of suffix sums
  identity)  ->  fold the 22 windows with 12 doublings between them.

All control flow is data-independent (sorts, rolls, where-selects) and
every scan is a lax.scan over levels with a single vectorized combine in
the body, so the whole MSM compiles to a small XLA program regardless of
n.  Sharding the point axis batch-splits the MSM across a mesh.

Measured tradeoff (ENGINEERING.md "TPU MSM"): one v5e chip runs the
Montgomery core at ~7.9 M modmul/s device-profiled (int8-MXU constant
products, 2.9x the pure-VPU fold; peak at B=2^14, falling to 5.4 M by
B=2^18) vs ~28 M modmul/s for the 4-core OpenMP C backend, and the
Hillis-Steele scans cost a log2(n) work factor the host's sequential
buckets don't pay — the default prover therefore keeps the C backend,
and this module is the correctness-validated scale-out path
(differentially tested: tests/test_tpu_msm.py).
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


def _hs_scan(pt, seg_ids, length: int):
    """Segmented inclusive scan (Hillis-Steele): after the pass, position
    i holds the sum of its segment's elements up to i.  seg_ids=None for
    an unsegmented scan.  lax.scan over log2(length) levels; each level is
    one full-width point_add behind a validity mask."""
    import jax
    import jax.numpy as jnp

    levels = max(1, (length - 1).bit_length())
    shifts = jnp.asarray([1 << k for k in range(levels)], dtype=jnp.int32)
    pos = jnp.arange(length)

    def step(carry, shift):
        X, Y, Z, inf = carry
        sx = jnp.roll(X, shift, axis=0)
        sy = jnp.roll(Y, shift, axis=0)
        sz = jnp.roll(Z, shift, axis=0)
        sinf = jnp.roll(inf, shift, axis=0)
        valid = pos >= shift
        if seg_ids is not None:
            valid = valid & (seg_ids == jnp.roll(seg_ids, shift, axis=0))
        ax, ay, az, ainf = point_add((sx, sy, sz, sinf), (X, Y, Z, inf))
        sel = lambda a, b: jnp.where(valid[..., None], a, b)
        out = (
            sel(ax, X), sel(ay, Y), sel(az, Z), jnp.where(valid, ainf, inf)
        )
        return out, None

    out, _ = jax.lax.scan(step, pt, shifts)
    return out


@functools.lru_cache(maxsize=None)
def _msm_jit(n: int, window: int = WINDOW):
    import jax
    import jax.numpy as jnp

    nb = 1 << window
    nw = (255 + window - 1) // window

    def one_window(carry, digits):
        X, Y, Z, inf = carry
        order = jnp.argsort(digits)
        d = digits[order]
        pt = (X[order], Y[order], Z[order], inf[order] | (d == 0))
        sx, sy, sz, sinf = _hs_scan(pt, d, n)
        is_end = jnp.concatenate([d[1:] != d[:-1], jnp.ones((1,), bool)])
        keep = is_end & ~sinf & (d > 0)
        idx = jnp.where(keep, d, 0)  # non-kept rows all write zeros at 0
        bx = jnp.zeros((nb, fq.NL), jnp.int32)
        by = jnp.zeros((nb, fq.NL), jnp.int32)
        bz = jnp.zeros((nb, fq.NL), jnp.int32)
        binf = jnp.ones((nb,), bool)
        zero_rows = jnp.zeros_like(sx)
        bx = bx.at[idx].set(jnp.where(keep[..., None], sx, zero_rows))
        by = by.at[idx].set(jnp.where(keep[..., None], sy, zero_rows))
        bz = bz.at[idx].set(jnp.where(keep[..., None], sz, zero_rows))
        binf = binf.at[idx].set(~keep)
        # sum_d d*B_d = sum over t>=1 of (sum_{d>=t} B_d): suffix sums via
        # an unsegmented scan on the reversed buckets, then one more scan
        # to total positions 0..nb-2
        rev = (bx[::-1], by[::-1], bz[::-1], binf[::-1])
        run = _hs_scan(rev, None, nb)
        partial = tuple(
            x[: nb - 1] if x.ndim == 1 else x[: nb - 1] for x in run
        )
        tot = _hs_scan(partial, None, nb - 1)
        wsum = tuple(x[-1] for x in tot)
        return (X, Y, Z, inf), wsum

    def msm(digits_all, X, Y, Z, inf):
        _, wsums = jax.lax.scan(
            one_window, (X, Y, Z, inf), digits_all
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


def _window_digits(scalars_u64: np.ndarray, window: int = WINDOW) -> np.ndarray:
    """(n, 4) u64 -> (nw, n) int32 window digits (host side)."""
    nw = (255 + window - 1) // window
    vals = [
        int(r[0]) | int(r[1]) << 64 | int(r[2]) << 128 | int(r[3]) << 192
        for r in scalars_u64
    ]
    out = np.zeros((nw, len(vals)), dtype=np.int32)
    for w in range(nw):
        sh = w * window
        out[w] = [(v >> sh) & ((1 << window) - 1) for v in vals]
    return out


def g1_msm_tpu(points, scalars, window: int | None = None):
    """MSM over a points.G1Array; returns an affine point or None.
    Differentially tested against the native C backend.  `window` trades
    bucket-scan length (2^w) for window count (255/w); None uses the
    module default (12, the TPU sweet spot) — tests pass small windows
    to keep CPU runtime sane."""
    import jax.numpy as jnp

    from .points import G1Array, ints_to_limbs

    if window is None:
        window = WINDOW
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
    digits = _window_digits(sc, window)
    if n_pad > n:
        digits = np.concatenate(
            [digits, np.zeros((digits.shape[0], n_pad - n), np.int32)], axis=1
        )

    x_int, y_int = [], []
    for i in range(n):
        if points.inf[i]:
            x_int.append(0)
            y_int.append(0)
        else:
            pt = points[i]
            x_int.append(pt[0] * fq.R_MONT % Q381)
            y_int.append(pt[1] * fq.R_MONT % Q381)
    x_int += [0] * (n_pad - n)
    y_int += [0] * (n_pad - n)
    X = jnp.asarray(fq.int_to_limbs(x_int))
    Y = jnp.asarray(fq.int_to_limbs(y_int))
    Z = jnp.asarray(fq.int_to_limbs([fq.R_MONT % Q381] * n_pad))
    inf = jnp.asarray(
        np.concatenate(
            [points.inf.astype(bool), np.ones((n_pad - n,), bool)]
        )
    )

    ox, oy, oz, oinf = (
        np.asarray(t)
        for t in _msm_jit(n_pad, window)(jnp.asarray(digits), X, Y, Z, inf)
    )
    if bool(oinf):
        return None
    return _jac_mont_to_affine(ox, oy, oz)


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
    x_int, y_int = [], []
    for i in range(n):
        if points.inf[i]:
            x_int.append(0)
            y_int.append(0)
        else:
            pt = points[i]
            x_int.append(pt[0] * fq.R_MONT % Q381)
            y_int.append(pt[1] * fq.R_MONT % Q381)
    x_int += [0] * (n_pad - n)
    y_int += [0] * (n_pad - n)
    X = jnp.asarray(fq.int_to_limbs(x_int))
    Y = jnp.asarray(fq.int_to_limbs(y_int))
    Z = jnp.asarray(fq.int_to_limbs([fq.R_MONT % Q381] * n_pad))
    inf = jnp.asarray(
        np.concatenate([points.inf.astype(bool), np.ones(n_pad - n, bool)])
    )

    mesh = Mesh(np.asarray(devices), ("pts",))
    core = _msm_jit(per, window)

    def shard_body(dg, x, y, z, nf):
        px, py, pz, pinf = core(dg, x, y, z, nf)
        return px[None], py[None], pz[None], pinf[None]

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(None, "pts"), P("pts"), P("pts"), P("pts"), P("pts")),
        out_specs=(P("pts"), P("pts"), P("pts"), P("pts")),
    )
    pX, pY, pZ, pI = (
        np.asarray(t) for t in sharded(jnp.asarray(digits), X, Y, Z, inf)
    )
    acc = None
    for d in range(D):
        if bool(pI[d]):
            continue
        aff = _jac_mont_to_affine(pX[d], pY[d], pZ[d])
        acc = g1_add(acc, g1_from_affine(aff))
    return g1_to_affine(acc) if acc is not None else None
