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


def ntt_with_hints(x, params: FalconParams, num_limbs: int = NUM_LIMBS):
    """Run the bound-tracked NTT on (batch, n) int32 coefficients in [0, q).

    Returns (t_limbs, b):
      t_limbs: (num_limbs, batch, n) int32 -- mod_q quotient hints
      b:       (batch, n) int32           -- NTT outputs in [0, q)
    """
    n, log_n = params.n, params.log_n
    table = np.asarray(params.ntt_table, dtype=np.int32)
    bounds = [
        jnp.asarray(int_to_limbs(c, num_limbs))
        for c in params.const_q_powers
    ]

    batch = x.shape[0]
    out = from_small(x.astype(jnp.int32), num_limbs)  # (L, batch, n)

    for l in range(log_n):
        m = 1 << l
        half = n >> (l + 1)
        # view as (L, batch, m, 2, half): groups of two halves
        o = out.reshape(num_limbs, batch, m, 2, half)
        u = o[:, :, :, 0, :]                          # (L, batch, m, half)
        hi = o[:, :, :, 1, :]
        s = jnp.asarray(table[m : 2 * m]).reshape(1, 1, m, 1)
        v = normalize(hi * s)                          # limb*s < 2^30
        c = bounds[l + 1].reshape(num_limbs, 1, 1, 1)
        neg_v = c - v                                  # redundant signed
        new0 = normalize(u + v)
        new1 = normalize(u + neg_v)
        out = jnp.stack([new0, new1], axis=3).reshape(num_limbs, batch, n)

    t_limbs, b = divmod_q(out)
    return t_limbs, b
