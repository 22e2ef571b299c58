#!/usr/bin/env python3
"""Measure the TPU G1 MSM path on live hardware and check it against the
native C backend.

Reports:
  1. raw Montgomery-multiply throughput (ops/fq_mont.mont_mul, batched);
  2. one full Pippenger G1 MSM (window 12) wall time + correctness vs
     the OpenMP C Pippenger on identical inputs;
  3. the C backend's time on the same MSM for the head-to-head number.

    python tools/tpu_msm_bench.py [n_points] [window]

The measured numbers feed the tradeoff note in snark/tpu_msm.py's
docstring and ENGINEERING.md.
"""

import os

# persistent XLA compile cache: multi-minute wide-tree MSM compiles
# survive across tool/bench processes (bench.py uses the same dir)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    print(f"platform: {jax.devices()[0].platform}, n={n}, window={window}")

    from falcon_r1cs_tpu.ops import fq_mont as fq
    from falcon_r1cs_tpu.snark import bls12_381 as bls
    from falcon_r1cs_tpu.snark import native_backend, tpu_msm
    from falcon_r1cs_tpu.snark.points import G1Array
    from falcon_r1cs_tpu.utils.profiling import throughput

    rng = np.random.default_rng(0)

    # 1. raw mont_mul throughput
    B = 1 << 14
    a = jnp.asarray(
        fq.int_to_limbs([int(x) for x in rng.integers(0, 1 << 62, B)])
    )
    mul8 = jax.jit(lambda x: _pow_chain(fq, x, 8))
    rate, details = throughput(mul8, (a,), items_per_call=8 * B)
    print(f"mont_mul: {rate/1e6:.2f} M modmul/s  {details['rates']}")

    # 2/3. MSM head-to-head
    gen = bls.g1_from_affine(bls.G1_GEN)
    base = bls.g1_mul(gen, 1234567)
    pts, cur = [], base
    for _ in range(n):  # cheap distinct points: repeated additions
        cur = bls.g1_add(cur, gen)
        pts.append(cur)
    # batch-normalize via single pass (affine conversion per point is
    # O(n) inversions in pure python; fine at these sizes)
    t0 = time.time()
    aff = [bls.g1_to_affine(p) for p in pts]
    print(f"(setup: affine conversion {time.time()-t0:.1f}s)")
    arr = G1Array.from_affine_list(aff)
    scalars = [int(x) for x in rng.integers(0, 1 << 63, n)]

    t0 = time.time()
    got_tpu = tpu_msm.g1_msm_tpu(arr, scalars, window=window)
    t_first = time.time() - t0
    t0 = time.time()
    got_tpu = tpu_msm.g1_msm_tpu(arr, scalars, window=window)
    t_tpu = time.time() - t0

    if native_backend.available():
        t0 = time.time()
        got_c = native_backend.g1_msm(arr, scalars)
        t_c = time.time() - t0
        ok = got_tpu == got_c
        print(f"C backend:  {t_c*1e3:.1f} ms   match={ok}")
        if not ok:
            print("MISMATCH", got_tpu, got_c)
            sys.exit(1)
    else:
        print("C backend unavailable; skipping cross-check")
    print(f"TPU MSM:    {t_tpu*1e3:.1f} ms (first call {t_first:.1f}s incl. "
          f"compile)  -> {n/t_tpu:.0f} pts/s")


def _pow_chain(fq, x, k):
    out = x
    for _ in range(k):
        out = fq.mont_mul(out, out)
    return out


if __name__ == "__main__":
    main()
