"""Isolate which MSM stage miscompiles on the TPU backend at n >= 2^14.

Context (round 3): g1_msm_tpu is bit-correct on the CPU XLA backend at
every size up to 2^17, and on TPU up to 2^12, but MISMATCHES on TPU from
2^14 — a backend regression in the new jax/libtpu environment (round 2
validated the same code at 2^14+ on the previous stack).  This driver
runs each stage of the pipeline on the TPU and on the host CPU backend
with identical inputs and reports the first diverging stage.

Run: python tools/tpu_msm_isolate.py [logn]
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
from falcon_r1cs_tpu.snark.points import G1Array, ints_to_limbs
from falcon_r1cs_tpu.snark.tpu_msm import (
    _bucket_reduce,
    _points_std_limbs,
    _weighted_bucket_sum,
    _window_digits,
    _Z_ONE,
    point_add,
)

WINDOW = 12


def both(fn, *args):
    """Run fn on the default (TPU) and CPU backends; return (tpu, cpu)."""
    cpu = jax.devices("cpu")[0]
    tpu_out = jax.jit(fn)(*args)
    cpu_args = jax.device_put(args, cpu)
    with jax.default_device(cpu):
        cpu_out = jax.jit(fn)(*cpu_args)
    return (
        jax.tree.map(np.asarray, tpu_out),
        jax.tree.map(np.asarray, cpu_out),
    )


def cmp(name, a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    bad = [
        i
        for i, (x, y) in enumerate(zip(flat_a, flat_b))
        if not np.array_equal(x, y)
    ]
    if bad:
        i = bad[0]
        d = flat_a[i] != flat_b[i]
        where = np.argwhere(d)
        print(f"{name}: DIVERGES (leaf {i}, {d.sum()} elems, first at "
              f"{where[0].tolist()})", flush=True)
        return False
    print(f"{name}: equal", flush=True)
    return True


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << logn
    nb = 1 << WINDOW
    base = [
        bls.g1_to_affine(bls.g1_mul(bls.g1_from_affine(bls.G1_GEN), k + 2))
        for k in range(8)
    ]
    blk = G1Array.from_affine_list(base)
    arr = G1Array(
        np.tile(blk.xs, (n // 8, 1)),
        np.tile(blk.ys, (n // 8, 1)),
        np.zeros(n, dtype=np.uint8),
    )
    rng = np.random.default_rng(3)
    sc = ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % bls.R for _ in range(n)], 4
    )
    digits = _window_digits(sc, WINDOW)  # (nw, n) int32, host-side
    Xs, Ys, inf = _points_std_limbs(arr, n)
    d0 = jnp.asarray(digits[7])  # a mid window with dense digits

    # stage 1: to_mont (elementwise modmul chain)
    ok = cmp("to_mont(X)", *both(fq.to_mont, Xs))

    # stage 2: argsort + gather
    def sort_gather(d, X):
        order = jnp.argsort(d)
        return d[order], X[order]

    ok &= cmp("argsort+gather", *both(sort_gather, d0, Xs))

    # stage 3: bucket_reduce on the sorted run
    def bucketize(d, X, Y, i):
        Xm, Ym = fq.to_mont(X), fq.to_mont(Y)
        Z = jnp.broadcast_to(jnp.asarray(_Z_ONE), Xm.shape)
        order = jnp.argsort(d)
        ds = d[order]
        pt = (Xm[order], Ym[order], Z[order], i[order] | (ds == 0))
        return _bucket_reduce(pt, ds, nb)

    ok &= cmp("bucket_reduce", *both(bucketize, d0, Xs, Ys, inf))

    # stage 4: weighted bucket sum on CPU-computed buckets
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bufs = jax.jit(bucketize)(
            *jax.device_put((d0, Xs, Ys, inf), cpu)
        )
    bufs = jax.tree.map(np.asarray, bufs)
    ok &= cmp(
        "weighted_bucket_sum",
        *both(lambda *b: _weighted_bucket_sum(b, nb), *bufs),
    )

    # stage 5: a long point_add chain (tree fold) on the montified points
    def fold(X, Y, i):
        Xm, Ym = fq.to_mont(X), fq.to_mont(Y)
        Z = jnp.broadcast_to(jnp.asarray(_Z_ONE), Xm.shape)
        pt = (Xm, Ym, Z, i)
        m = n
        while m > 1:
            pt = point_add(
                tuple(a[0::2] for a in pt), tuple(a[1::2] for a in pt)
            )
            m //= 2
        return pt

    ok &= cmp("tree point_add", *both(fold, Xs, Ys, inf))
    print("ALL EQUAL" if ok else "divergence above", flush=True)


if __name__ == "__main__":
    main()
