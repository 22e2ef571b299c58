"""Coefficient-sharded NTT via shard_map + ppermute: the sequence-parallel
analog (SURVEY.md section 2.4 "NTT-stage parallelism").

With the coefficient axis sharded over D devices (shard width w = n/D),
Cooley-Tukey stage l pairs positions j and j + n/2^(l+1):

  * the first log2(D) stages pair across shards -- each shard exchanges its
    whole block with its butterfly partner (shard_id XOR D >> (l+1)) via
    lax.ppermute over ICI, then computes its half of the butterflies
    locally (within those stages a shard lies inside ONE twiddle group, so
    the stage twiddle is a per-shard scalar);
  * the remaining log2(n) - log2(D) stages are purely local.

This is the direct analog of ring/Ulysses head-vs-sequence re-sharding:
shard width is chosen so only log2(D) stages need communication
(SURVEY.md section 7 hard part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.modq import add_mod_q, mul_mod_q, sub_mod_q
from ..params import FalconParams


def ntt_sharded(mesh: Mesh, params: FalconParams, axis: str = "coeff"):
    """Returns a jitted (B, n)->(B, n) forward NTT with the coefficient
    axis sharded over `axis` of `mesh`.  Inputs in [0, q)."""
    n, log_n = params.n, params.log_n
    D = mesh.shape[axis]
    if D & (D - 1) or n % D:
        raise ValueError(f"device axis {D} must be a power of two dividing n")
    log_d = D.bit_length() - 1
    w = n // D
    table = np.asarray(params.ntt_table, dtype=np.int32)

    def local_fn(x):  # x: (B, w) local shard
        r = jax.lax.axis_index(axis)

        # --- cross-shard stages: l = 0 .. log_d-1 -----------------------
        for l in range(log_d):
            m = 1 << l
            dist = D >> (l + 1)           # partner distance in shards
            partner_perm = [
                (src, src ^ dist) for src in range(D)
            ]
            other = jax.lax.ppermute(x, axis, partner_perm)
            is_lo = (r & dist) == 0
            # per-shard scalar twiddle: group index = r >> (log_d - l)
            group = r >> (log_d - l)
            s = jnp.asarray(table)[m + group]
            # lo shard: u = x, v = other*s;    out = u + v
            # hi shard: u = other, v = x*s;    out = u + (q - ...) i.e. u - v
            v_lo = mul_mod_q(other, s)
            v_hi = mul_mod_q(x, s)
            x = jnp.where(
                is_lo, add_mod_q(x, v_lo), sub_mod_q(other, v_hi)
            )

        # --- local stages: l = log_d .. log_n-1 -------------------------
        B = x.shape[0]
        for l in range(log_d, log_n):
            m = 1 << l
            half = n >> (l + 1)
            # groups fully inside the shard: local group count = m // D
            mloc = m // D
            x = x.reshape(B, mloc, 2, half)
            # global group index of local group i: r*mloc + i
            base = m + r * mloc
            s = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(table), base, mloc
            ).reshape(1, mloc, 1)
            u = x[:, :, 0, :]
            v = mul_mod_q(x[:, :, 1, :], s)
            x = jnp.stack([add_mod_q(u, v), sub_mod_q(u, v)], axis=2)
        return x.reshape(B, w)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis),
    )
    return jax.jit(fn)
