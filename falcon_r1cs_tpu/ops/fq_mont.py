"""BLS12-381 base-field (Fq, 381-bit) lazy Montgomery arithmetic on TPU.

The Groth16 prover's MSMs are the one hot path the round-1 VERDICT asked
to try on-device ("move the provers' MSMs onto the TPU with the existing
limb machinery").  This module is that experiment's core primitive:
batched Montgomery multiplication over signed 12-bit limb tensors with
NO cross-lane carry/borrow scans anywhere in the data path.

Why scan-free matters: an exact-canonical design (word-serial CIOS, or
product-scan + Kogge-Stone carry fix + conditional-subtract per op) was
built first and measured.  Composed into the elliptic group law, XLA
compiled each Jacobian point-add to ~285 ms on CPU (~50x the sum of its
parts) and took minutes per MSM compile — the comparison-heavy carry
scans defeat both fusion and codegen.  The lazy design below keeps every
op elementwise/shift-local (pure VPU work on TPU) and recovers exact
carries arithmetically instead of structurally.

Representation ("relaxed" limbs):
  (..., 35) int32; value = sum l_i 2^(12 i); limbs SIGNED with
  |l_i| <= 2^12 + 2 and the top (headroom) limb |l_34| small.  A value's
  representation is not unique and may be negative; everything downstream
  is mod-q arithmetic, so representatives are free until a comparison.
  Montgomery domain: x is stored as x * 2^408 mod q (R = 2^408 > 2^396
  gives ~2^27 of value headroom, which makes the bound algebra trivially
  stable: mont_mul contracts |value| to ~1.0005 q for any inputs below
  ~2^13 q).

Core tricks:
  - `_big_mul`: 35x35 outer product folded along anti-diagonals with the
    skew-reshape trick (pad rows, flatten, re-view one column narrower:
    row i lands shifted by i) — no shift-add chain, no dense collector.
  - masked shift-add rounds (`_semi`) redistribute limbs below 2^12+2;
    they are value-preserving UNCONDITIONALLY (the top column is left
    unmasked so no carry/borrow ever falls off the buffer).  Product
    buffers carry two spare columns; `mont_mul` folds them back into the
    result's headroom limb (the fold is <= 2 by the value bound).
  - the exact divide-by-R in Montgomery reduction: T + m*q is an exact
    multiple of R; its low 34 limbs form k*R for a small k recovered by
    one float32 dot (error << 0.5, see `_carry_estimate`), so the shift
    is a slice plus one scalar add — no carry scan.
  - equality/zero tests (`is_zero_mod_q`): subtract the f32-estimated
    quotient alpha*q, then prove the remainder is literally zero via CRT
    residues modulo 30 13-bit primes (one int32 dot + f32-reciprocal
    mod-p) — product of the primes exceeds q, so all-zero residues of a
    |z| < q/2 value imply z == 0.

Reference role: replaces the host/C Pippenger field core for the
device MSM (snark/tpu_msm.py); differentially tested against the
pure-Python BLS12-381 implementation in tests/test_tpu_msm.py.
"""

from __future__ import annotations

import numpy as np

from ..snark.bls12_381 import P as Q381

LIMB = 12
MASK = (1 << LIMB) - 1
NSIG = 34            # significant limbs: 2^408 > q * 2^27
NL = NSIG + 1        # plus one headroom limb
PROD = 2 * NL + 1    # product buffer: 69 anti-diagonals + 2 spare columns
R_BITS = LIMB * NSIG  # Montgomery R = 2^408
R_MONT = 1 << R_BITS
R2 = R_MONT * R_MONT % Q381
MU = (-pow(Q381, -1, R_MONT)) % R_MONT  # -q^{-1} mod 2^408


def _to_limb_vec(v: int, n: int) -> np.ndarray:
    return np.asarray([(v >> (LIMB * k)) & MASK for k in range(n)],
                      dtype=np.int32)


Q_LIMBS = _to_limb_vec(Q381, NL)
MU_LIMBS = _to_limb_vec(MU, NSIG)  # mu < 2^408
# f32 weights recovering k = value(low 34 limbs) / 2^408 (|k| <= 2):
# terms are exact powers of two times <= 2^13 ints, so the dot's error
# is bounded by 34 roundings of magnitude <= 2^-23 — far below 0.5.
_CARRY_W = np.asarray(
    [float(2.0 ** (LIMB * i - R_BITS)) for i in range(NSIG)], dtype=np.float32
)
# f32 weights estimating value / q (exact to ~2^-17 relative for the
# |value| <= 2^16 q range used by is_zero_mod_q)
_ALPHA_W = np.asarray(
    [float((1 << (LIMB * i)) / Q381) for i in range(NL)], dtype=np.float32
)

# 30 distinct 13-bit primes; their product (~2^389.8) exceeds q, so a
# value in (-q/2, q/2) with all residues zero is zero.
_CRT_PRIMES = []
_c = (1 << 13) - 1
while len(_CRT_PRIMES) < 30:
    for _d in range(3, 91, 2):
        if _c % _d == 0:
            break
    else:
        _CRT_PRIMES.append(_c)
    _c -= 2
_CRT_PRIMES = np.asarray(_CRT_PRIMES, dtype=np.int32)
_ZCOLS = NL + 2  # zero-test scratch width (2 spare columns for _semi)
_CRT_W = np.stack(
    [
        np.asarray(
            [pow(1 << (LIMB * i), 1, int(p)) for i in range(_ZCOLS)],
            dtype=np.int32,
        )
        for p in _CRT_PRIMES
    ],
    axis=1,
)  # (_ZCOLS, 30)
_CRT_RECIP = (1.0 / _CRT_PRIMES.astype(np.float64)).astype(np.float32)


def int_to_limbs(vals) -> np.ndarray:
    """list[int] -> (B, 35) int32 canonical (nonneg, < 2^12) limbs."""
    out = np.zeros((len(vals), NL), dtype=np.int32)
    for i, v in enumerate(vals):
        v = int(v) % Q381
        for k in range(NL):
            out[i, k] = v & MASK
            v >>= LIMB
    return out


def limbs_to_int(row) -> int:
    """Exact signed evaluation (python bigint); callers reduce mod q."""
    return sum(int(c) << (LIMB * k) for k, c in enumerate(np.asarray(row)))


def _shift_up(x, sh: int):
    """Move limb k to k+sh (toward higher significance), zero-fill low.
    The top `sh` limbs fall off — callers guarantee they are zero."""
    import jax.numpy as jnp

    pad = jnp.zeros(x.shape[:-1] + (sh,), dtype=x.dtype)
    return jnp.concatenate([pad, x[..., : x.shape[-1] - sh]], axis=-1)


def _semi_round(t):
    """One masked shift-add round: t_k -> (t_k & MASK) + (t_{k-1} >> 12)
    for k < top; the TOP column is left unmasked (it keeps its own full
    value plus the incoming carry), so the round is value-preserving
    UNCONDITIONALLY — including negative top limbs, whose arithmetic
    shift would otherwise emit a -1 carry off the end of the buffer.
    Top-column growth per round is just the incoming carry; every call
    site's buffer puts only small residue there (see mont_mul)."""
    import jax.numpy as jnp

    low = t & MASK
    carry = t >> LIMB
    out = low + _shift_up(carry, 1)
    top = t[..., -1] + carry[..., -2]
    return jnp.concatenate([out[..., :-1], top[..., None]], axis=-1)


def _semi(t, rounds: int = 3):
    """Semi-normalize: |limbs| < 2^29 -> <= 2^12 + 2 in three rounds
    (carry magnitudes shrink 2^17 -> 2^5 -> 2 across rounds)."""
    for _ in range(rounds):
        t = _semi_round(t)
    return t


def _big_mul(a, b, ncols: int = PROD):
    """Limb product: (..., na) x (nb,)|(..., nb) -> (..., ncols) raw
    anti-diagonal sums T[c] = sum_{i+j=c} a_i b_j.  Entries are exact in
    int32: 35 * (2^12 + 2)^2 < 2^29.1.  The row-shift uses the
    skew-reshape trick (see module docstring): pad rows to width
    w = na + nb, flatten, re-view at width w - 1 so row i lands shifted
    by i columns."""
    import jax.numpy as jnp

    na = a.shape[-1]
    nb = b.shape[-1]
    prod = a[..., :, None] * b[..., None, :]          # (..., na, nb)
    w = na + nb
    padded = jnp.concatenate(
        [prod, jnp.zeros(prod.shape[:-1] + (w - nb,), prod.dtype)], axis=-1
    )
    flat = padded.reshape(padded.shape[:-2] + (na * w,))
    skew = flat[..., : na * (w - 1)].reshape(flat.shape[:-1] + (na, w - 1))
    out = skew.sum(axis=-2)  # na + nb - 1 active columns
    if ncols <= w - 1:
        return out[..., :ncols]
    pad = jnp.zeros(out.shape[:-1] + (ncols - (w - 1),), out.dtype)
    return jnp.concatenate([out, pad], axis=-1)


def _toeplitz(vec, nin: int) -> np.ndarray:
    """Banded Toeplitz matrix of a fixed limb vector: (x @ T)[c] =
    sum_i x_i vec_{c-i} — the anti-diagonal fold of _big_mul with one
    operand constant, as a matmul."""
    T = np.zeros((nin, PROD), dtype=np.int32)
    for i in range(nin):
        for j, v in enumerate(vec):
            T[i, i + j] = int(v)
    return T


def _dec8(T):
    """Split a <2^12 nonneg matrix into two int8 base-64 planes."""
    return (T & 63).astype(np.int8), (T >> 6).astype(np.int8)


_T_MU0, _T_MU1 = _dec8(_toeplitz(MU_LIMBS, NSIG))
_T_Q0, _T_Q1 = _dec8(_toeplitz(Q_LIMBS, NL))


def _const_mul(x, T0, T1):
    """Fixed-operand limb product as int8 MXU matmuls.

    Two of mont_mul's three limb products have a CONSTANT operand (mu
    and q).  Splitting both sides into base-64 planes turns each into
    four (.., nin) @ (nin, 71) int8->int32 matmuls that ride the MXU
    instead of the VPU outer-product + skew fold: measured 2.9x the
    whole mont_mul on a v5e (ENGINEERING.md "TPU MSM").  Exact: per-dot
    magnitudes <= 35 * 65 * 63 and the <<12 recombination stays below
    2^31.  x = (x >> 6) * 64 + (x & 63) holds for signed x too
    (arithmetic shift + two's-complement mask)."""
    import jax.numpy as jnp
    from jax import lax

    x0 = jnp.bitwise_and(x, 63).astype(jnp.int8)
    x1 = jnp.right_shift(x, 6).astype(jnp.int8)

    def d(a, M):
        return lax.dot_general(
            a, jnp.asarray(M), (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    y00 = d(x0, T0)
    y01 = d(x0, T1)
    y10 = d(x1, T0)
    y11 = d(x1, T1)
    return y00 + ((y01 + y10) << 6) + (y11 << 12)


def _carry_estimate(s_low):
    """k = value(s_low) / 2^408 for a 34-limb slice whose value is an
    exact multiple of 2^408 (|k| <= 2).  One f32 dot + round."""
    import jax.numpy as jnp

    est = (s_low.astype(jnp.float32) * jnp.asarray(_CARRY_W)).sum(axis=-1)
    return jnp.round(est).astype(jnp.int32)


def mont_mul(a, b):
    """Batched lazy Montgomery product: (..., 35) x (..., 35) -> (..., 35).

    result = (T + m q)/R with T = a b and m = T mu mod R.  All three
    products run through `_big_mul` into a 71-column buffer; with input
    limbs <= 2^12 + 2 (headroom limb <= ~2^10) the `_semi` carries die
    out two columns past the last active anti-diagonal, so columns 69-70
    stay zero and nothing is ever dropped: T, u and s are EXACT
    integers.  s = T + u is an exact multiple of R; `_carry_estimate`
    recovers the low half's contribution and the divide-by-R is a
    slice.  Output |value| <= ~1.0005 q for |inputs| <= 2^13 q — the
    representation is closed under the group law with huge margin."""
    import jax.numpy as jnp

    t_full = _semi(_big_mul(a, b))                     # exact T, 71 cols
    m = _semi(_const_mul(t_full[..., :NSIG], _T_MU0, _T_MU1))[..., :NSIG]
    # m's spill columns are dropped: multiples of R vanish mod R, and
    # the rep overshoot (|m| <= R (1 + 2^-11)) is absorbed by headroom
    m_ext = jnp.concatenate(
        [m, jnp.zeros(m.shape[:-1] + (NL - NSIG,), m.dtype)], axis=-1
    )
    u = _semi(_const_mul(m_ext, _T_Q0, _T_Q1))         # exact m*q
    s = _semi_round(t_full + u)                        # exact, == 0 mod R
    k = _carry_estimate(s[..., :NSIG])
    hi = s[..., NSIG : NSIG + NL]                      # exact shift by R
    # fold the spill columns (69, 70 — borrow/carry residue that walked
    # past the last active anti-diagonal) into the headroom limb.  The
    # fold is provably tiny: |value(hi + spill)| = |s/R - k| <= ~1.5 q,
    # and the 34 limbs below the top contribute at most ~1.0005 * 2^408,
    # so |top + spill-fold| <= 2 — NOT the 2^29 a naive per-column bound
    # suggests.  Dropping these columns (the original design) corrupted
    # any product whose relaxed inputs carried a negative borrow chain.
    spill = s[..., NSIG + NL :]
    top = (
        hi[..., -1]
        + (spill[..., 0] << LIMB)
        + (spill[..., 1] << (2 * LIMB))
    )
    return jnp.concatenate(
        [hi[..., 0:1] + k[..., None], hi[..., 1:-1], top[..., None]],
        axis=-1,
    )


def add_mod(a, b):
    """Lazy add: limbwise sum + one redistribution round.  Signed,
    no reduction — values accumulate (bounds contract at the next mul)."""
    return _semi_round(a + b)


def sub_mod(a, b):
    """Lazy subtract: limbwise difference (negative limbs are fine)."""
    return _semi_round(a - b)


def to_mont(a_std):
    import jax.numpy as jnp

    r2 = jnp.asarray(int_to_limbs([R2])[0])
    return mont_mul(a_std, jnp.broadcast_to(r2, a_std.shape))


def from_mont(a_mont):
    import jax.numpy as jnp

    one = np.zeros((NL,), dtype=np.int32)
    one[0] = 1
    return mont_mul(a_mont, jnp.broadcast_to(jnp.asarray(one), a_mont.shape))


def is_zero_mod_q(t):
    """Exact (t == 0 mod q) for relaxed reps with |value| <= ~2^15 q.

    alpha = round(value/q) via one f32 dot (exact: the estimate error is
    ~2^-17 relative), z = t - alpha q is then in (-q/2, q/2) and zero
    iff t == 0 mod q.  z's 30 CRT residues mod 13-bit primes (int32 dot
    + f32-reciprocal mod) are all zero iff z == 0, since the primes'
    product exceeds q.  Elementwise + two small dots: no carry scans."""
    import jax.numpy as jnp

    alpha = jnp.round(
        (t.astype(jnp.float32) * jnp.asarray(_ALPHA_W)).sum(axis=-1)
    ).astype(jnp.int32)
    z = t - alpha[..., None] * jnp.asarray(Q_LIMBS)
    z = jnp.concatenate(
        [z, jnp.zeros(z.shape[:-1] + (_ZCOLS - NL,), z.dtype)], axis=-1
    )
    z = _semi(z, rounds=3)  # |limbs| <= 2^12 + 2, spare cols absorb tops
    r = jnp.einsum("...i,ij->...j", z, jnp.asarray(_CRT_W),
                   preferred_element_type=jnp.int32)
    kq = jnp.round(r.astype(jnp.float32) * jnp.asarray(_CRT_RECIP)).astype(
        jnp.int32
    ) * jnp.asarray(_CRT_PRIMES)
    return ((r - kq) == 0).all(axis=-1)


def eq_mod_q(a, b):
    """Exact value equality mod q of two relaxed reps."""
    return is_zero_mod_q(sub_mod(a, b))
