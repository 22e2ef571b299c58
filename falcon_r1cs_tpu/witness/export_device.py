"""Device-side canonical witness export: (B, num_witness, 5) uint32 limbs.

The host interleaver (layout.py) goes through Python objects -- fine for
parity tests, too slow for production hand-off to an external prover.  This
packer assembles the canonical little-endian 32-bit-limb witness matrix
entirely on device with precomputed scatter indices (one plane per limb;
only the NTT quotient hints occupy limbs 1..4, everything else fits limb 0).

All verify-with-NTT witness values are < 2^147 (quotients) so 5 limbs are
exact; the ~255-bit field embedding pads with zero limbs (the schoolbook
circuit's is_eq multipliers are full-field and remain host-expanded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FalconParams, get_params
from .layout import bound_width, num_witness

NUM_U32 = 5


@functools.lru_cache(maxsize=None)
def _ntt_layout_indices(n: int):
    """Slot index arrays for each segment of the verify-with-NTT layout."""
    params = get_params(n)
    idx = {}
    base = 0

    def take(name, count):
        nonlocal base
        idx[name] = np.arange(base, base + count, dtype=np.int32)
        base += count

    take("sig", n)
    take("v", n)
    take("range_v", 27 * n)
    take("sig_ntt", 29 * n)
    take("v_ntt", 29 * n)
    take("pointwise", 30 * n)
    take("norm", 18 * 2 * n)
    take("bound", bound_width(params))
    assert base == num_witness(params)
    # within each (n, 29) mod_q block: slot 0 = t, slot 1 = b, 2.. = tail
    block = idx["sig_ntt"].reshape(n, 29)
    idx["sig_ntt_t"] = np.ascontiguousarray(block[:, 0])
    idx["sig_ntt_b"] = np.ascontiguousarray(block[:, 1])
    idx["sig_ntt_tail"] = np.ascontiguousarray(block[:, 2:])
    block = idx["v_ntt"].reshape(n, 29)
    idx["v_ntt_t"] = np.ascontiguousarray(block[:, 0])
    idx["v_ntt_b"] = np.ascontiguousarray(block[:, 1])
    idx["v_ntt_tail"] = np.ascontiguousarray(block[:, 2:])
    return idx


def _limbs16_to_u32(t_limbs):
    """(L=11, B, n) 16-bit limbs -> (5, B, n) int32 32-bit limbs (value
    < 2^160 so the 6th u32 limb is always zero)."""
    pairs = [
        t_limbs[2 * k] + (t_limbs[2 * k + 1] << 16) for k in range(5)
    ]
    return jnp.stack(pairs)


@functools.lru_cache(maxsize=None)
def packer_ntt(n: int):
    """jit-compiled device packer: engine segment dict -> (B, W, 5) int32."""
    params = get_params(n)
    W = num_witness(params)
    idx = {k: jnp.asarray(v) for k, v in _ntt_layout_indices(n).items()}

    @jax.jit
    def pack(seg):
        B = seg["sig"].shape[0]
        plane0 = jnp.zeros((B, W), jnp.int32)
        plane0 = plane0.at[:, idx["sig"]].set(seg["sig"])
        plane0 = plane0.at[:, idx["v"]].set(seg["v"])
        plane0 = plane0.at[:, idx["range_v"]].set(
            seg["range_v"].reshape(B, -1)
        )
        sig_t32 = _limbs16_to_u32(seg["sig_ntt_t"])
        v_t32 = _limbs16_to_u32(seg["v_ntt_t"])
        plane0 = plane0.at[:, idx["sig_ntt_t"]].set(sig_t32[0])
        plane0 = plane0.at[:, idx["sig_ntt_b"]].set(seg["sig_ntt_b"])
        plane0 = plane0.at[:, idx["sig_ntt_tail"].reshape(-1)].set(
            seg["sig_ntt_tail"].reshape(B, -1)
        )
        plane0 = plane0.at[:, idx["v_ntt_t"]].set(v_t32[0])
        plane0 = plane0.at[:, idx["v_ntt_b"]].set(seg["v_ntt_b"])
        plane0 = plane0.at[:, idx["v_ntt_tail"].reshape(-1)].set(
            seg["v_ntt_tail"].reshape(B, -1)
        )
        plane0 = plane0.at[:, idx["pointwise"]].set(
            seg["pointwise"].reshape(B, -1)
        )
        plane0 = plane0.at[:, idx["norm"]].set(seg["norm"].reshape(B, -1))
        plane0 = plane0.at[:, idx["bound"]].set(seg["bound"])

        planes = [plane0]
        for k in range(1, NUM_U32):
            pk = jnp.zeros((B, W), jnp.int32)
            pk = pk.at[:, idx["sig_ntt_t"]].set(sig_t32[k])
            pk = pk.at[:, idx["v_ntt_t"]].set(v_t32[k])
            planes.append(pk)
        return jnp.stack(planes, axis=-1)  # (B, W, 5)

    return pack
