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

from ..params import get_params
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
    # split sub-blocks matching the engine's value/bit segment split
    pw = idx["pointwise"].reshape(n, 30)
    idx["pointwise_vals"] = np.ascontiguousarray(pw[:, :3])
    idx["pointwise_tail"] = np.ascontiguousarray(pw[:, 3:])
    nb = idx["norm"].reshape(2 * n, 18)
    # transposed: the engine emits norm segments feature-major (B,16,2n),
    # so the flattened scatter order is (feature, coeff)
    idx["norm_bits"] = np.ascontiguousarray(nb[:, :16].T)
    idx["norm_vals"] = np.ascontiguousarray(nb[:, 16:].T)
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
def packer_dual(n: int):
    """Device packer for the dual-NTT circuit: (B, W, 5) int32.

    Layout per engine_dual.py; the two is_zero pairs are constants on the
    valid path (is_neq bit 0, multiplier 1)."""
    params = get_params(n)
    widths = [
        ("sig_pos", n), ("sig_neg", n), ("sig_orth", n), ("orth1", 2),
        ("v_pos", n), ("v_neg", n), ("v_orth", n), ("orth2", 2),
        ("sp", 29 * n), ("sn", 29 * n), ("vp", 29 * n), ("vn", 29 * n),
        ("pointwise", 60 * n), ("norm_sq", 4 * n),
        ("bound", bound_width(params)),
    ]
    idx = {}
    base = 0
    for name, w in widths:
        idx[name] = np.arange(base, base + w, dtype=np.int32)
        base += w
    W = base
    for k in ("sp", "sn", "vp", "vn"):
        blk = idx[k].reshape(n, 29)
        idx[k + "_t"] = np.ascontiguousarray(blk[:, 0])
        idx[k + "_b"] = np.ascontiguousarray(blk[:, 1])
        idx[k + "_tail"] = np.ascontiguousarray(blk[:, 2:])
    # split pointwise sub-blocks: values feature-first, int8 tails
    pwb = idx["pointwise"].reshape(n, 60)
    idx["pw_vals"] = np.ascontiguousarray(pwb[:, [0, 1, 2, 30, 31, 32]].T)
    idx["pw_tail_l"] = np.ascontiguousarray(pwb[:, 3:30])
    idx["pw_tail_r"] = np.ascontiguousarray(pwb[:, 33:60])
    jidx = {k: jnp.asarray(v) for k, v in idx.items()}

    @jax.jit
    def pack(seg):
        B = seg["sig_pos"].shape[0]
        plane0 = jnp.zeros((B, W), jnp.int32)
        for k in ("sig_pos", "sig_neg", "sig_orth", "v_pos", "v_neg",
                  "v_orth"):
            plane0 = plane0.at[:, jidx[k]].set(seg[k])
        for orth in ("orth1", "orth2"):
            pair = jnp.broadcast_to(
                jnp.asarray([0, 1], jnp.int32), (B, 2)
            )
            plane0 = plane0.at[:, jidx[orth]].set(pair)
        t32 = {}
        for nm, tk, bk, tailk in (
            ("sp", "sp_t", "sp_b", "sp_tail"),
            ("sn", "sn_t", "sn_b", "sn_tail"),
            ("vp", "vp_t", "vp_b", "vp_tail"),
            ("vn", "vn_t", "vn_b", "vn_tail"),
        ):
            t32[nm] = _limbs16_to_u32(seg[tk])
            plane0 = plane0.at[:, jidx[tk]].set(t32[nm][0])
            plane0 = plane0.at[:, jidx[bk]].set(seg[bk])
            plane0 = plane0.at[:, jidx[tailk].reshape(-1)].set(
                seg[tailk].reshape(B, -1).astype(jnp.int32)
            )
        for f in range(6):
            plane0 = plane0.at[:, jidx["pw_vals"][f]].set(
                seg["pointwise_vals"][f]
            )
        plane0 = plane0.at[:, jidx["pw_tail_l"].reshape(-1)].set(
            seg["pointwise_tail_l"].reshape(B, -1).astype(jnp.int32)
        )
        plane0 = plane0.at[:, jidx["pw_tail_r"].reshape(-1)].set(
            seg["pointwise_tail_r"].reshape(B, -1).astype(jnp.int32)
        )
        plane0 = plane0.at[:, jidx["norm_sq"]].set(seg["norm_sq"])
        plane0 = plane0.at[:, jidx["bound"]].set(seg["bound"].astype(jnp.int32))
        planes = [plane0]
        for k in range(1, NUM_U32):
            pk = jnp.zeros((B, W), jnp.int32)
            for nm in ("sp", "sn", "vp", "vn"):
                pk = pk.at[:, jidx[nm + "_t"]].set(t32[nm][k])
            planes.append(pk)
        return jnp.stack(planes, axis=-1)

    return pack


@functools.lru_cache(maxsize=None)
def packer_schoolbook(n: int):
    """Device packer for the schoolbook circuit: (B, W, 8) int32 (the is_eq
    multipliers are full ~255-bit field values, expanded on device from
    their 3-value codes via a constant limb table)."""
    from .engine_schoolbook import NEG_Q_INV_MOD_P, Q_INV_MOD_P

    params = get_params(n)
    widths = [
        ("sig", n), ("v_block", 28 * n), ("main", n * (n + 34)),
        ("norm", 36 * n), ("bound", bound_width(params)),
    ]
    idx = {}
    base = 0
    for name, w in widths:
        idx[name] = np.arange(base, base + w, dtype=np.int32)
        base += w
    W = base
    main_blk = idx["main"].reshape(n, n + 34)
    sub = {
        "tc": main_blk[:, :2],
        "prods": main_blk[:, 2 : n + 2],
        "c_tail": main_blk[:, n + 2 : n + 29],
        "iseq": main_blk[:, n + 29 :],
    }
    m_slots = np.ascontiguousarray(main_blk[:, [n + 30, n + 32]])
    jidx = {k: jnp.asarray(v) for k, v in idx.items()}
    jsub = {k: jnp.asarray(np.ascontiguousarray(v)) for k, v in sub.items()}
    jm_slots = jnp.asarray(m_slots)

    mult_table = np.zeros((3, 8), dtype=np.uint32)
    for c, v in enumerate((1, Q_INV_MOD_P, NEG_Q_INV_MOD_P)):
        for k in range(8):
            mult_table[c, k] = v & 0xFFFFFFFF
            v >>= 32
    jmult = jnp.asarray(mult_table.view(np.int32))

    @jax.jit
    def pack(seg):
        B = seg["sig"].shape[0]
        codes = seg["iseq"][:, :, [1, 3]]  # (B, n, 2) multiplier codes
        plane0 = jnp.zeros((B, W), jnp.int32)
        plane0 = plane0.at[:, jidx["sig"]].set(seg["sig"])
        plane0 = plane0.at[:, jidx["v_block"]].set(
            seg["v_block"].reshape(B, -1)
        )
        for k in ("tc", "prods", "c_tail", "iseq"):
            plane0 = plane0.at[:, jsub[k].reshape(-1)].set(
                seg[k].reshape(B, -1).astype(jnp.int32)
            )
        plane0 = plane0.at[:, jidx["norm"]].set(seg["norm"].reshape(B, -1))
        plane0 = plane0.at[:, jidx["bound"]].set(seg["bound"].astype(jnp.int32))
        planes = []
        for k in range(8):
            pk = plane0 if k == 0 else jnp.zeros((B, W), jnp.int32)
            pk = pk.at[:, jm_slots.reshape(-1)].set(
                jmult[codes, k].reshape(B, -1)
            )
            planes.append(pk)
        return jnp.stack(planes, axis=-1)

    return pack


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
            seg["range_v"].reshape(B, -1).astype(jnp.int32)
        )
        sig_t32 = _limbs16_to_u32(seg["sig_ntt_t"])
        v_t32 = _limbs16_to_u32(seg["v_ntt_t"])
        plane0 = plane0.at[:, idx["sig_ntt_t"]].set(sig_t32[0])
        plane0 = plane0.at[:, idx["sig_ntt_b"]].set(seg["sig_ntt_b"])
        plane0 = plane0.at[:, idx["sig_ntt_tail"].reshape(-1)].set(
            seg["sig_ntt_tail"].reshape(B, -1).astype(jnp.int32)
        )
        plane0 = plane0.at[:, idx["v_ntt_t"]].set(v_t32[0])
        plane0 = plane0.at[:, idx["v_ntt_b"]].set(seg["v_ntt_b"])
        plane0 = plane0.at[:, idx["v_ntt_tail"].reshape(-1)].set(
            seg["v_ntt_tail"].reshape(B, -1).astype(jnp.int32)
        )
        plane0 = plane0.at[:, idx["pointwise_vals"].reshape(-1)].set(
            seg["pointwise"].reshape(B, -1)
        )
        plane0 = plane0.at[:, idx["pointwise_tail"].reshape(-1)].set(
            seg["pointwise_tail"].reshape(B, -1).astype(jnp.int32)
        )
        # norm segments arrive feature-first (16|2, B, 2n): one scatter
        # per feature row avoids a device transpose
        for f in range(seg["norm_bits"].shape[0]):
            plane0 = plane0.at[:, idx["norm_bits"][f]].set(
                seg["norm_bits"][f].astype(jnp.int32)
            )
        for f in range(seg["norm_vals"].shape[0]):
            plane0 = plane0.at[:, idx["norm_vals"][f]].set(
                seg["norm_vals"][f]
            )
        plane0 = plane0.at[:, idx["bound"]].set(
            seg["bound"].astype(jnp.int32)
        )

        planes = [plane0]
        for k in range(1, NUM_U32):
            pk = jnp.zeros((B, W), jnp.int32)
            pk = pk.at[:, idx["sig_ntt_t"]].set(sig_t32[k])
            pk = pk.at[:, idx["v_ntt_t"]].set(v_t32[k])
            planes.append(pk)
        return jnp.stack(planes, axis=-1)  # (B, W, 5)

    return pack
