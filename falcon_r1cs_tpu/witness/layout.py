"""Witness layout: interleaving compact device segments into the canonical
flat witness vector (arkworks allocation order) and limb export.

The flat order is the contract checked bit-exactly against the host trace
(`ConstraintSystem.witness_values`); see engine.py's layout table.
"""

from __future__ import annotations

import numpy as np

from ..ops.limbs import limbs_to_ints
from ..params import FalconParams


def bound_width(params: FalconParams) -> int:
    return 50 if params.n == 512 else 52


def num_witness(params: FalconParams) -> int:
    n = params.n
    return n + n + 27 * n + 29 * n * 2 + 30 * n + 18 * 2 * n + bound_width(params)


def interleave_witness(seg: dict, params: FalconParams) -> np.ndarray:
    """Assemble (B, num_witness) object array of Python ints from the
    engine's segment dict (host-side; for export and parity tests)."""
    n = params.n
    sig = np.asarray(seg["sig"], dtype=object)
    v = np.asarray(seg["v"], dtype=object)
    B = sig.shape[0]

    range_v = np.asarray(seg["range_v"], dtype=object)

    def modq_seg(t_limbs, b, tail):
        t_ints = limbs_to_ints(np.asarray(t_limbs))        # (B, n) objects
        b = np.asarray(b, dtype=object)
        tail = np.asarray(tail, dtype=object)              # (B, n, 27)
        out = np.empty((B, n, 29), dtype=object)
        out[:, :, 0] = t_ints
        out[:, :, 1] = b
        out[:, :, 2:] = tail
        return out

    sig_ntt = modq_seg(seg["sig_ntt_t"], seg["sig_ntt_b"], seg["sig_ntt_tail"])
    v_ntt = modq_seg(seg["v_ntt_t"], seg["v_ntt_b"], seg["v_ntt_tail"])
    # canonical 30-wide pointwise block = [prod, t, c | bits+chain]
    pointwise = np.concatenate(
        [
            np.asarray(seg["pointwise"], dtype=object),
            np.asarray(seg["pointwise_tail"], dtype=object),
        ],
        axis=-1,
    )
    # canonical 18-wide norm block = [bits|nor|and | select, square];
    # the engine emits these feature-first (16|2, B, 2n) — transpose back
    norm = np.concatenate(
        [
            np.asarray(seg["norm_bits"], dtype=object).transpose(1, 2, 0),
            np.asarray(seg["norm_vals"], dtype=object).transpose(1, 2, 0),
        ],
        axis=-1,
    )
    bound = np.asarray(seg["bound"], dtype=object)

    parts = [
        sig.reshape(B, -1),
        v.reshape(B, -1),
        range_v.reshape(B, -1),
        sig_ntt.reshape(B, -1),
        v_ntt.reshape(B, -1),
        pointwise.reshape(B, -1),
        norm.reshape(B, -1),
        bound.reshape(B, -1),
    ]
    out = np.concatenate(parts, axis=1)
    assert out.shape == (B, num_witness(params))
    return out


def export_witness_limbs(seg: dict, params: FalconParams) -> np.ndarray:
    """Canonical dense export: (B, num_witness, 5) uint32 little-endian
    32-bit limbs (all witness values are < 2^160; the ~255-bit field
    embedding pads with zero limbs)."""
    flat = interleave_witness(seg, params)
    B, W = flat.shape
    out = np.zeros((B, W, 5), dtype=np.uint32)
    for b in range(B):
        for w in range(W):
            v = int(flat[b, w])
            for k in range(5):
                out[b, w, k] = v & 0xFFFFFFFF
                v >>= 32
            assert v == 0
    return out
