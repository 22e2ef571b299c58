"""Bisect INSIDE point_add: return every intermediate and find the first
one that diverges TPU-vs-CPU at the failing width (2^13).

Run: python tools/tpu_padd_bisect.py [logm]
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

    def steps(Xv, Yv):
        mul = fq.mont_mul
        X1, Y1 = fq.to_mont(Xv), fq.to_mont(Yv)
        Z1 = jnp.broadcast_to(jnp.asarray(tpu_msm._Z_ONE), X1.shape)
        X2 = jnp.concatenate([X1[-1:], X1[:-1]], axis=0)
        Y2 = jnp.concatenate([Y1[-1:], Y1[:-1]], axis=0)
        Z2 = Z1
        out = {}
        out["Z1Z1"] = Z1Z1 = mul(Z1, Z1)
        out["Z2Z2"] = Z2Z2 = mul(Z2, Z2)
        out["U1"] = U1 = mul(X1, Z2Z2)
        out["U2"] = U2 = mul(X2, Z1Z1)
        out["Y1Z2"] = Y1Z2 = mul(Y1, Z2)
        out["S1"] = S1 = mul(Y1Z2, Z2Z2)
        out["Y2Z1"] = Y2Z1 = mul(Y2, Z1)
        out["S2"] = S2 = mul(Y2Z1, Z1Z1)
        H = tpu_msm._sub_mod(U2, U1)
        out["H"] = H
        HH = tpu_msm._dbl_small(H)
        out["I"] = I = mul(HH, HH)
        out["J"] = J = mul(H, I)
        rr = tpu_msm._dbl_small(tpu_msm._sub_mod(S2, S1))
        out["rr"] = rr
        out["V"] = V = mul(U1, I)
        out["rr2"] = rr2 = mul(rr, rr)
        out["X3"] = X3 = tpu_msm._sub_mod(
            tpu_msm._sub_mod(rr2, J), tpu_msm._dbl_small(V))
        out["S1J"] = S1J = mul(S1, J)
        out["Y3"] = tpu_msm._sub_mod(
            mul(rr, tpu_msm._sub_mod(V, X3)), tpu_msm._dbl_small(S1J))
        out["Z1Z2"] = Z1Z2 = mul(Z1, Z2)
        out["Z3"] = tpu_msm._dbl_small(mul(Z1Z2, H))
        out["same_x"] = tpu_msm._eq(U1, U2)
        out["same_y"] = tpu_msm._eq(S1, S2)
        return out

    jf = jax.jit(steps)
    tpu = jax.tree.map(np.asarray, jf(Xs, Ys))
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        ref = jax.tree.map(
            np.asarray, jax.jit(steps)(*jax.device_put((Xs, Ys), cpu_dev))
        )
    for k in tpu:
        a, b = tpu[k], ref[k]
        if np.array_equal(a, b):
            print(f"{k}: equal", flush=True)
        else:
            d = a != b
            rows = np.unique(np.argwhere(d)[:, 0])
            print(f"{k}: DIVERGES ({d.sum()}/{d.size} elems, "
                  f"{len(rows)} rows, first row {rows[0]})", flush=True)


if __name__ == "__main__":
    main()
