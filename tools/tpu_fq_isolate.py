"""Micro-isolate the fq_mont primitive that miscompiles on TPU at wide
batches (round 3: point_add chains diverge TPU-vs-CPU at width 2^14,
while every stage is exact on the CPU XLA backend).

Tests, per width 2^12 / 2^13 / 2^14 / 2^15, TPU vs CPU backend:
  mont_mul          (the full product: _big_mul + int8-MXU _const_mul +
                     f32 carry estimate)
  _big_mul          (VPU outer-product + skew fold)
  _const_mul(mu)    (the int8 dot_general pair)
  _carry_estimate   (f32 dot + round) on mont_mul-shaped inputs
  is_zero_mod_q     (int32 CRT dot + f32 reciprocal)
  point_add         (one step, no chain)

Run: python tools/tpu_fq_isolate.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

_PLAT = jax.devices()[0].platform
print(f"default platform: {_PLAT}", flush=True)
assert _PLAT in ("tpu", "axon"), (
    "default backend fell back to CPU -- a TPU-vs-CPU differential on this "
    "process would be cpu-vs-cpu and meaningless.  NOTE: setting PYTHONPATH "
    "(to anything) breaks axon TPU discovery on this image; run as "
    "'python tools/<tool>.py' with PYTHONPATH unset."
)

import numpy as np

import jax.numpy as jnp

from falcon_r1cs_tpu.ops import fq_mont as fq
from falcon_r1cs_tpu.snark import tpu_msm
import falcon_r1cs_tpu.snark.bls12_381 as bls


def both(fn, *args):
    cpu = jax.devices("cpu")[0]
    t = jax.tree.map(np.asarray, jax.jit(fn)(*args))
    with jax.default_device(cpu):
        c = jax.tree.map(
            np.asarray, jax.jit(fn)(*jax.device_put(args, cpu))
        )
    return t, c


def cmp(name, t, c):
    la, lb = jax.tree.leaves(t), jax.tree.leaves(c)
    for i, (x, y) in enumerate(zip(la, lb)):
        if not np.array_equal(x, y):
            d = x != y
            print(f"  {name}: DIVERGES (leaf {i}, {d.sum()}/{d.size} elems)",
                  flush=True)
            return False
    print(f"  {name}: equal", flush=True)
    return True


def main():
    rng = np.random.default_rng(0)
    for logm in (12, 13, 14, 15):
        m = 1 << logm
        print(f"width 2^{logm}:", flush=True)
        a = fq.int_to_limbs(
            [int.from_bytes(rng.bytes(47), "little") % bls.P
             for _ in range(64)]
        )
        A = jnp.asarray(np.tile(a, (m // 64, 1)))
        b = fq.int_to_limbs(
            [int.from_bytes(rng.bytes(47), "little") % bls.P
             for _ in range(64)]
        )
        B = jnp.asarray(np.tile(b, (m // 64, 1)))
        cmp("mont_mul", *both(fq.mont_mul, A, B))
        cmp("_big_mul", *both(fq._big_mul, A, B))
        cmp("_const_mul(mu)",
            *both(lambda x: fq._const_mul(x[..., :fq.NSIG], fq._T_MU0,
                                          fq._T_MU1), A))
        # carry-estimate on an exact multiple of R: s = (x*R) as limbs
        s = fq.int_to_limbs(
            [(int.from_bytes(rng.bytes(4), "little") % 3) << fq.R_BITS
             for _ in range(64)]
        )
        S = jnp.asarray(np.tile(s, (m // 64, 1)))
        cmp("_carry_estimate",
            *both(lambda x: fq._carry_estimate(x[..., :fq.NSIG]), S))
        if hasattr(fq, "is_zero_mod_q"):
            Zr = jnp.asarray(np.tile(
                fq.int_to_limbs([0, 1, bls.P, 2 * bls.P, 7] * 12 + [0] * 4),
                (m // 64, 1)))
            cmp("is_zero_mod_q", *both(fq.is_zero_mod_q, Zr))
        # one point_add step on montified generator multiples
        gen = bls.g1_from_affine(bls.G1_GEN)
        pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(64)]
        Xs = jnp.asarray(np.tile(np.stack(
            [fq.int_to_limbs([int(p[0])])[0] for p in pts]), (m // 64, 1)))
        Ys = jnp.asarray(np.tile(np.stack(
            [fq.int_to_limbs([int(p[1])])[0] for p in pts]), (m // 64, 1)))

        def one_add(Xv, Yv):
            Xm, Ym = fq.to_mont(Xv), fq.to_mont(Yv)
            Z = jnp.broadcast_to(jnp.asarray(tpu_msm._Z_ONE), Xm.shape)
            i0 = jnp.zeros(Xm.shape[:-1], bool)
            p1 = (Xm, Ym, Z, i0)
            p2 = tuple(jnp.roll(t, 1, axis=0) for t in (Xm, Ym, Z)) + (i0,)
            return tpu_msm.point_add(p1, p2)

        cmp("point_add(1 step)", *both(one_add, Xs, Ys))


if __name__ == "__main__":
    main()
