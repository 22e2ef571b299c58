"""Characterize the TPU point_add divergence: determinism + tile pattern.

point_add(1 step) diverged TPU-vs-CPU at width 2^13 but not 2^12/14/15
(tools/tpu_fq_isolate.py) while every constituent primitive is exact at
all widths — i.e. a fused-composition miscompilation or nondeterminism.
This runs the same jitted step R times on the TPU at a given width,
checks run-to-run determinism, and prints the structure of any
divergence vs the CPU backend (wrong-row blocks, wrong-limb columns).

Run: python tools/tpu_padd_pattern.py [logm] [R]
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
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    m = 1 << logm
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

    jf = jax.jit(one_add)
    runs = [jax.tree.map(np.asarray, jf(Xs, Ys)) for _ in range(R)]
    det = all(
        all(np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(runs[0]), jax.tree.leaves(r)))
        for r in runs[1:]
    )
    print(f"width 2^{logm}: TPU run-to-run deterministic = {det}")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = jax.tree.map(
            np.asarray, jax.jit(one_add)(*jax.device_put((Xs, Ys), cpu))
        )
    for name, t, c in zip("XYZi", jax.tree.leaves(runs[0]),
                          jax.tree.leaves(ref)):
        if np.array_equal(t, c):
            print(f"  leaf {name}: equal")
            continue
        d = t != c
        rows = np.unique(np.argwhere(d)[:, 0])
        cols = (np.unique(np.argwhere(d)[:, 1])
                if d.ndim > 1 else np.array([]))
        # contiguous row-run structure
        breaks = np.where(np.diff(rows) > 1)[0]
        runs_r = np.split(rows, breaks + 1)
        desc = ", ".join(
            f"{r[0]}..{r[-1]}" for r in runs_r[:8]
        ) + ("..." if len(runs_r) > 8 else "")
        print(f"  leaf {name}: {d.sum()} wrong; rows {len(rows)} in "
              f"{len(runs_r)} runs [{desc}]; cols {cols.tolist()[:40]}")
        # row-run lengths modulo common tile heights
        lens = sorted({len(r) for r in runs_r})
        print(f"    run lengths: {lens[:10]}; first row mod 8 = "
              f"{rows[0] % 8}, mod 256 = {rows[0] % 256}")


if __name__ == "__main__":
    main()
