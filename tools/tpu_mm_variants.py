"""Candidate workarounds for the chained-_const_mul miscompile
(tools/tpu_mm_chain_bisect.py: depth-2 mont_mul diverges at 2^13 because
the int8 MXU dot_general pair produces garbage when its INPUT is a fused
computed tensor; t_full itself is exact).

Each variant swaps the m_raw/u computation inside mont_mul at depth 2:
  a. int8-MXU (status quo)            -- expected DIVERGES
  b. VPU skew-fold (_big_mul)         -- the FQ_VPU flag
  c. barrier before the int8 convert  -- optimization_barrier(t_full)
  d. int16 planes dot_general         -- skip the int8 datapath
  e. one int32 dot_general, no planes -- raw Toeplitz (fits int32)
  f. f32 dot pair (planes as f32)     -- MXU float path, exact < 2^24

Run: python tools/tpu_mm_variants.py [logm]   (PYTHONPATH unset!)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

_PLAT = jax.devices()[0].platform
print(f"default platform: {_PLAT}", flush=True)
assert _PLAT in ("tpu", "axon"), "CPU fallback -- unset PYTHONPATH and rerun"

import numpy as np
import jax.numpy as jnp
from jax import lax

import falcon_r1cs_tpu.snark.bls12_381 as bls
from falcon_r1cs_tpu.ops import fq_mont as fq

_T_MU_RAW = jnp.asarray(fq._toeplitz(fq.MU_LIMBS, fq.NSIG))
_T_Q_RAW = jnp.asarray(fq._toeplitz(fq.Q_LIMBS, fq.NL))


def _dot(a, M, prefer=jnp.int32):
    return lax.dot_general(
        a, M, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=prefer)


def cm_int8(x, T0, T1, raw):
    return fq._const_mul(x, T0, T1)


def cm_vpu(x, T0, T1, raw):
    vec = fq.MU_LIMBS if raw is _T_MU_RAW else fq.Q_LIMBS
    return fq._big_mul(x, jnp.asarray(vec))


def cm_barrier(x, T0, T1, raw):
    return fq._const_mul(lax.optimization_barrier(x), T0, T1)


def cm_int16(x, T0, T1, raw):
    x0 = jnp.bitwise_and(x, 63).astype(jnp.int16)
    x1 = jnp.right_shift(x, 6).astype(jnp.int16)
    y00 = _dot(x0, T0.astype(jnp.int16))
    y01 = _dot(x0, T1.astype(jnp.int16))
    y10 = _dot(x1, T0.astype(jnp.int16))
    y11 = _dot(x1, T1.astype(jnp.int16))
    return y00 + ((y01 + y10) << 6) + (y11 << 12)


def cm_int32(x, T0, T1, raw):
    return _dot(x, raw)


def cm_f32(x, T0, T1, raw):
    x0 = jnp.bitwise_and(x, 63).astype(jnp.float32)
    x1 = jnp.right_shift(x, 6).astype(jnp.float32)
    y00 = _dot(x0, T0.astype(jnp.float32), jnp.float32).astype(jnp.int32)
    y01 = _dot(x0, T1.astype(jnp.float32), jnp.float32).astype(jnp.int32)
    y10 = _dot(x1, T0.astype(jnp.float32), jnp.float32).astype(jnp.int32)
    y11 = _dot(x1, T1.astype(jnp.float32), jnp.float32).astype(jnp.int32)
    return y00 + ((y01 + y10) << 6) + (y11 << 12)


def make_mont_mul(cm):
    def mont_mul(a, b):
        t_full = fq._semi(fq._big_mul(a, b))
        m = fq._semi(cm(t_full[..., : fq.NSIG], fq._T_MU0, fq._T_MU1,
                        _T_MU_RAW))[..., : fq.NSIG]
        m_ext = jnp.concatenate(
            [m, jnp.zeros(m.shape[:-1] + (fq.NL - fq.NSIG,), m.dtype)],
            axis=-1)
        u = fq._semi(cm(m_ext, fq._T_Q0, fq._T_Q1, _T_Q_RAW))
        s = fq._semi_round(t_full + u)
        k = fq._carry_estimate(s[..., : fq.NSIG])
        hi = s[..., fq.NSIG : fq.NSIG + fq.NL]
        spill = s[..., fq.NSIG + fq.NL :]
        top = (hi[..., -1] + (spill[..., 0] << fq.LIMB)
               + (spill[..., 1] << (2 * fq.LIMB)))
        return jnp.concatenate(
            [hi[..., 0:1] + k[..., None], hi[..., 1:-1], top[..., None]],
            axis=-1)
    return mont_mul


def both(fn, *args):
    cpu = jax.devices("cpu")[0]
    t = np.asarray(jax.jit(fn)(*args))
    with jax.default_device(cpu):
        c = np.asarray(jax.jit(fn)(*jax.device_put(args, cpu)))
    return t, c


def main():
    logm = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    which = set(sys.argv[2:])
    m = 1 << logm
    rng = np.random.default_rng(3)
    a = fq.int_to_limbs(
        [int.from_bytes(rng.bytes(47), "little") % bls.P for _ in range(64)])
    b = fq.int_to_limbs(
        [int.from_bytes(rng.bytes(47), "little") % bls.P for _ in range(64)])
    A = jnp.asarray(np.tile(a, (m // 64, 1)))
    B = jnp.asarray(np.tile(b, (m // 64, 1)))

    print(f"width 2^{logm}, depth-2 chain", flush=True)
    for name, cm in (("int8", cm_int8), ("vpu", cm_vpu),
                     ("barrier", cm_barrier), ("int16", cm_int16),
                     ("int32", cm_int32), ("f32", cm_f32)):
        if which and name not in which:
            continue
        mm = make_mont_mul(cm)
        t, c = both(lambda x, y: mm(mm(x, y), y), A, B)
        if np.array_equal(t, c):
            print(f"  {name}: equal", flush=True)
        else:
            d = t != c
            print(f"  {name}: DIVERGES ({d.sum()}/{d.size})", flush=True)


if __name__ == "__main__":
    main()
