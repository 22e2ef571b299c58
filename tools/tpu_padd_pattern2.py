"""Second-stage discrimination of the 2^13 point_add divergence.

(1) jnp.roll alone at (2^13, 35) int32 — data movement only;
(2) the same point_add step with a concatenate-based shift replacing
    jnp.roll;
(3) semantic decode: do the TPU rows equal the expected Jacobian sums at
    a DIFFERENT row offset (movement bug), the negated point, or nothing
    recognizable (arithmetic bug)?

Run: python tools/tpu_padd_pattern2.py [logm]
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

import falcon_r1cs_tpu.snark.bls12_381 as bls
from falcon_r1cs_tpu.ops import fq_mont as fq
from falcon_r1cs_tpu.snark import tpu_msm


def main():
    logm = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    m = 1 << logm
    gen = bls.g1_from_affine(bls.G1_GEN)
    pts = [bls.g1_to_affine(bls.g1_mul(gen, k + 2)) for k in range(64)]
    Xs = jnp.asarray(np.tile(np.stack(
        [fq.int_to_limbs([int(p[0])])[0] for p in pts]), (m // 64, 1)))
    Ys = jnp.asarray(np.tile(np.stack(
        [fq.int_to_limbs([int(p[1])])[0] for p in pts]), (m // 64, 1)))

    def roll_only(Xv):
        return jnp.roll(Xv, 1, axis=0)

    t = np.asarray(jax.jit(roll_only)(Xs))
    c = np.roll(np.asarray(Xs), 1, axis=0)
    print(f"jnp.roll at 2^{logm}: {'equal' if np.array_equal(t, c) else 'DIVERGES'}",
          flush=True)

    def one_add(shift):
        def f(Xv, Yv):
            Xm, Ym = fq.to_mont(Xv), fq.to_mont(Yv)
            Z = jnp.broadcast_to(jnp.asarray(tpu_msm._Z_ONE), Xm.shape)
            i0 = jnp.zeros(Xm.shape[:-1], bool)
            p1 = (Xm, Ym, Z, i0)
            p2 = tuple(shift(t) for t in (Xm, Ym, Z)) + (i0,)
            return tpu_msm.point_add(p1, p2)
        return f

    roll = lambda t: jnp.roll(t, 1, axis=0)
    cat = lambda t: jnp.concatenate([t[-1:], t[:-1]], axis=0)
    for name, sh in (("roll", roll), ("concat-shift", cat)):
        f = one_add(sh)
        tpu = jax.tree.map(np.asarray, jax.jit(f)(Xs, Ys))
        cpu_dev = jax.devices("cpu")[0]
        with jax.default_device(cpu_dev):
            ref = jax.tree.map(
                np.asarray, jax.jit(f)(*jax.device_put((Xs, Ys), cpu_dev))
            )
        eq = all(np.array_equal(a, b) for a, b in
                 zip(jax.tree.leaves(tpu), jax.tree.leaves(ref)))
        print(f"point_add({name}) at 2^{logm}: "
              f"{'equal' if eq else 'DIVERGES'}", flush=True)
        if eq or name != "roll":
            continue
        # semantic decode of rows 0..63 of the TPU result
        def dec(row):
            v = fq.limbs_to_int(row) % bls.P
            # leave Montgomery domain
            return v * pow(fq.R_MONT, -1, bls.P) % bls.P

        exp_aff = {}
        for k in range(64):
            a = bls.g1_from_affine(pts[k])
            b = bls.g1_from_affine(pts[(k - 1) % 64])
            s = bls.g1_to_affine(bls.g1_add(a, b))
            exp_aff[k] = s
        hits, neg_hits, misses = 0, 0, 0
        for r in range(64):
            x = dec(tpu[0][r])
            y = dec(tpu[1][r])
            z = dec(tpu[2][r])
            if z == 0:
                misses += 1
                continue
            zi = pow(z, -1, bls.P)
            ax = x * zi * zi % bls.P
            ay = y * zi * zi * zi % bls.P
            matched = False
            for k, (ex, ey) in exp_aff.items():
                if ax == ex:
                    if ay == ey:
                        hits += 1
                        if k != r % 64:
                            print(f"  row {r}: matches expected row {k}!")
                    else:
                        neg_hits += 1
                    matched = True
                    break
            if not matched:
                misses += 1
        print(f"  decode rows 0..63: {hits} valid point matches, "
              f"{neg_hits} negated, {misses} garbage", flush=True)


if __name__ == "__main__":
    main()
