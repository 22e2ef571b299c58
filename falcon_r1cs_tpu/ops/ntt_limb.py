"""The bound-tracked NTT over exact 176-bit limb tensors: witness-side twin
of the ntt_circuit gadget.

Replicates, with real values, exactly the constraint-free butterfly
recursion of `/root/reference/falcon-r1cs/src/gadgets/poly.rs:104-159`:

    stage l:  v     = out[j+ht] * s          (s = table[m+i] < q)
              neg_v = 2^l * q^(l+2) - v      (const_vars[l+1], a multiple of
                                              q that dominates v)
              out[j], out[j+ht] = out[j] + v, out[j] + neg_v

then the final mod_q hint per output coefficient: quotient t = floor(V/q)
(the big ~2^146 witness) and remainder b = V mod q.  The (t, b) pairs ARE
the gadget's witness values -- butterflies allocate nothing.

Everything is batched: input (batch, n) int32 -> t limbs (L, batch, n) and
b (batch, n).  The stage loop is a static Python loop (log_n iterations)
unrolled into the jaxpr; butterflies within a stage are one vectorized
reshape + elementwise op over the whole (L, batch, n) tensor.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import FalconParams
from .limbs import (
    NUM_LIMBS,
    divmod_q,
    from_small,
    int_to_limbs,
    normalize,
)


def _semi_norm(x):
    """One parallel carry round: (x & 0xFFFF) + shift_up(x >> 16).

    Limbs stay in [-3, 2^16 + 2] (see tools/pallas_ntt_v3.py for the bound
    derivation), which keeps limb * s inside int32 for the next stage while
    preserving the redundant value exactly -- and replaces the 11-step
    sequential carry chain with two whole-tensor passes, cutting the XLA
    path's HBM traffic ~4x."""
    low = jnp.bitwise_and(x, 0xFFFF)
    carry = jnp.right_shift(x, 16)  # arithmetic shift: signed-safe
    shifted = jnp.concatenate(
        [jnp.zeros_like(carry[:1]), carry[:-1]], axis=0
    )
    return low + shifted


_SEMI_LIMBS = NUM_LIMBS + 1  # 192-bit headroom: top limb never carries out


def ntt_with_hints(x, params: FalconParams, num_limbs: int = NUM_LIMBS):
    """Run the bound-tracked NTT on (batch, n) int32 coefficients in [0, q).

    Returns (t_limbs, b):
      t_limbs: (num_limbs, batch, n) int32 -- mod_q quotient hints
      b:       (batch, n) int32           -- NTT outputs in [0, q)

    Carries are semi-propagated per stage (one parallel round, exact in a
    redundant representation); the single full normalization + divmod runs
    once at the end.
    """
    n, log_n = params.n, params.log_n
    L = _SEMI_LIMBS
    table = np.asarray(params.ntt_table, dtype=np.int32)
    bounds = [
        jnp.asarray(int_to_limbs(c, L)) for c in params.const_q_powers
    ]

    batch = x.shape[0]
    out = from_small(x.astype(jnp.int32), L)  # (L, batch, n)

    for l in range(log_n):
        m = 1 << l
        half = n >> (l + 1)
        # view as (L, batch, m, 2, half): groups of two halves
        o = out.reshape(L, batch, m, 2, half)
        u = o[:, :, :, 0, :]                          # (L, batch, m, half)
        hi = o[:, :, :, 1, :]
        s = jnp.asarray(table[m : 2 * m]).reshape(1, 1, m, 1)
        v = _semi_norm(hi * s)                         # |limb*s| < 2^31
        c = bounds[l + 1].reshape(L, 1, 1, 1)
        new0 = _semi_norm(u + v)
        new1 = _semi_norm(u + (c - v))
        out = jnp.stack([new0, new1], axis=3).reshape(L, batch, n)

    t_limbs, b = divmod_q(normalize(out))
    return t_limbs[:num_limbs], b


def ntt_hints(x, params: FalconParams, use_pallas: bool = False):
    """Backend dispatch for the limb NTT: the fused Pallas kernel (about
    1.5x faster on-device when Mosaic is available) or the XLA path."""
    if use_pallas:
        from .pallas_ntt import ntt_with_hints_pallas
        from ..utils.config import get_config

        return ntt_with_hints_pallas(x, params, get_config().pallas_block)
    return ntt_with_hints(x, params)


def intt_then_hints(w, params: FalconParams, use_pallas: bool = False):
    """The v derivation chain: NTT-domain w = (hm - sig_ntt*pk) mod q ->
    (v_t limbs, v_b, v) where v = INTT(w) and (v_t, v_b) are its forward
    hint-NTT outputs.

    Default: XLA INTT composed with the hint-NTT backend — the fused
    INTT-prologue Pallas kernel (pallas_ntt.intt_ntt_hints_pallas) is
    bit-identical but measured SLOWER on a v5e (the prologue is
    VPU-compute-bound at ~18 us/stage in Mosaic vs ~14 us/stage for
    XLA's butterfly passes, both with f32-divmod and integer-Montgomery
    reductions tried; BASELINE.md round-3 notes).  It stays available
    behind FALCON_R1CS_TPU_FUSED_INTT=1 since the tradeoff is
    backend-version-dependent."""
    import os

    if use_pallas and os.environ.get("FALCON_R1CS_TPU_FUSED_INTT") == "1":
        from .pallas_ntt import intt_ntt_hints_pallas
        from ..utils.config import get_config

        return intt_ntt_hints_pallas(w, params, get_config().pallas_block)
    from ..falcon.ntt import intt_jax

    v = intt_jax(w, params.n)
    t, b = ntt_with_hints(v, params) if not use_pallas else ntt_hints(
        v, params, use_pallas
    )
    return t, b, v
