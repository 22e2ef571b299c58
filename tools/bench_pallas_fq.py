"""On-chip A/B: Pallas VMEM-resident Fq kernels vs the XLA formulation
(VERDICT r3 #3).

Measures device-profiled modmul/s for:
  1. single mont_mul        (XLA vs Pallas)
  2. depth-8 mont_mul chain (XLA* vs Pallas) — the VMEM-residency case;
     *XLA runs the chunked-shape mitigation's 3-D form above 2^13 rows
      because the flat rank-2 chain MISCOMPILES there (8192-row cliff)
  3. fused complete point_add (XLA vs Pallas), counted at 17 muls/add

Also bit-checks every Pallas result against the CPU-exact reference on
the first batch.  Run: python tools/bench_pallas_fq.py [rows_log2]
(PYTHONPATH unset — it breaks axon TPU discovery.)
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

import jax

_PLAT = jax.devices()[0].platform
print(f"default platform: {_PLAT}", flush=True)
assert _PLAT in ("tpu", "axon"), "CPU fallback -- unset PYTHONPATH"

import jax.numpy as jnp

import falcon_r1cs_tpu.ops.fq_mont as fq
import falcon_r1cs_tpu.ops.pallas_fq as pf
from bench import device_time_us_from_trace


def _device_us(fn, iters=4):
    import shutil
    import tempfile

    jax.block_until_ready(fn())
    tmp = tempfile.mkdtemp(prefix="pfq_")
    try:
        jax.profiler.start_trace(tmp)
        try:
            out = None
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
        finally:
            jax.profiler.stop_trace()
        us = device_time_us_from_trace(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (us or 0) / iters


def main():
    rows_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    R = 1 << rows_log2
    rng = np.random.default_rng(0)
    a = jnp.asarray(fq.int_to_limbs(
        [int.from_bytes(rng.bytes(47), "little") % fq.Q381
         for _ in range(R)]))
    b = jnp.asarray(fq.int_to_limbs(
        [int.from_bytes(rng.bytes(47), "little") % fq.Q381
         for _ in range(R)]))
    ab = jax.block_until_ready(pf.to_blocks(a))
    bb = jax.block_until_ready(pf.to_blocks(b))
    a = jax.block_until_ready(a)
    b = jax.block_until_ready(b)

    DEPTH = 8

    # --- XLA single + chain (chunked 3-D form above the 8192-row cliff)
    CH = 4096

    def _xla_chain(depth):
        @jax.jit
        def f(x2, y2):
            x3 = x2.reshape(R // CH, CH, fq.NL)
            y3 = y2.reshape(R // CH, CH, fq.NL)
            out = jax.vmap(fq.mont_mul)(x3, y3)
            for _ in range(depth - 1):
                out = jax.vmap(fq.mont_mul)(out, y3)
            return out.reshape(R, fq.NL)

        return f

    xla1 = _xla_chain(1)
    xlaD = _xla_chain(DEPTH)
    pal1 = jax.jit(lambda x2, y2: pf.mont_mul_pallas(x2, y2))
    palD = jax.jit(lambda x2, y2: pf.mont_mul_chain_pallas(x2, y2, DEPTH))

    # bit-equality on-chip (values vs CPU-exact reference via host ints)
    w1 = np.asarray(jax.block_until_ready(xla1(a, b)))
    g1 = np.asarray(pf.from_blocks(jax.block_until_ready(pal1(ab, bb))))
    eq1 = np.array_equal(w1, g1)
    gD = np.asarray(pf.from_blocks(jax.block_until_ready(palD(ab, bb))))
    wD = np.asarray(jax.block_until_ready(xlaD(a, b)))
    # the XLA chain rides the vmap mitigation, so it is exact on-chip too
    eqD = np.array_equal(wD, gD)
    print(f"bit-equal: mul {eq1}, chain{DEPTH} {eqD}", flush=True)

    us_x1 = _device_us(lambda: xla1(a, b))
    us_p1 = _device_us(lambda: pal1(ab, bb))
    us_xD = _device_us(lambda: xlaD(a, b))
    us_pD = _device_us(lambda: palD(ab, bb))

    def rate(us, muls):
        return R * muls / us if us else 0.0

    print(f"rows = 2^{rows_log2}")
    print(f"mont_mul   XLA: {us_x1:9.0f} us  {rate(us_x1,1)/1e6:7.1f} M/s")
    print(f"mont_mul   PAL: {us_p1:9.0f} us  {rate(us_p1,1)/1e6:7.1f} M/s")
    print(f"chain{DEPTH}     XLA: {us_xD:9.0f} us  "
          f"{rate(us_xD,DEPTH)/1e6:7.1f} M/s")
    print(f"chain{DEPTH}     PAL: {us_pD:9.0f} us  "
          f"{rate(us_pD,DEPTH)/1e6:7.1f} M/s")

    # --- point_add: XLA (chunked) vs Pallas fused
    import falcon_r1cs_tpu.snark.tpu_msm as tm

    Xm = fq.to_mont(a)
    Ym = fq.to_mont(b)
    z_one = fq.int_to_limbs([(1 << 408) % fq.Q381])
    Z = jnp.asarray(np.broadcast_to(z_one, (R, fq.NL)).copy())
    inf = jnp.zeros(R, bool)
    perm = np.random.default_rng(1).permutation(R)
    p1 = tuple(jax.block_until_ready(t) for t in (Xm, Ym, Z, inf))
    p2 = tuple(jax.block_until_ready(t) for t in
               (Xm[perm], Ym[perm], Z, inf))

    @jax.jit
    def xla_add(p1t, p2t):
        def c(t):
            return t.reshape((R // CH, CH) + t.shape[1:])

        out = jax.vmap(tm.point_add)(tuple(map(c, p1t)), tuple(map(c, p2t)))
        return tuple(t.reshape((R,) + t.shape[2:]) for t in out)

    b1 = tuple(jax.block_until_ready(t) for t in
               (pf.to_blocks(Xm), pf.to_blocks(Ym), pf.to_blocks(Z),
                pf.flags_to_blocks(inf)))
    b2 = tuple(jax.block_until_ready(t) for t in
               (pf.to_blocks(Xm[perm]), pf.to_blocks(Ym[perm]),
                pf.to_blocks(Z), pf.flags_to_blocks(inf)))
    pal_add = jax.jit(lambda q1, q2: pf.point_add_pallas(q1, q2))

    wa = jax.block_until_ready(xla_add(p1, p2))
    ga = jax.block_until_ready(pal_add(b1, b2))
    eq_add = all(
        np.array_equal(
            np.asarray(pf.from_blocks(g)), np.asarray(w)
        )
        for g, w in zip(ga[:3], wa[:3])
    ) and np.array_equal(
        np.asarray(pf.flags_from_blocks(ga[3])), np.asarray(wa[3])
    )
    print(f"bit-equal: point_add {eq_add}", flush=True)

    us_xa = _device_us(lambda: xla_add(p1, p2))
    us_pa = _device_us(lambda: pal_add(b1, b2))
    print(f"point_add  XLA: {us_xa:9.0f} us  "
          f"{rate(us_xa,17)/1e6:7.1f} M modmul/s "
          f"({R/us_xa if us_xa else 0:6.2f} M adds/s)")
    print(f"point_add  PAL: {us_pa:9.0f} us  "
          f"{rate(us_pa,17)/1e6:7.1f} M modmul/s "
          f"({R/us_pa if us_pa else 0:6.2f} M adds/s)")
    if us_pa and us_xa:
        print(f"pallas point_add speedup: {us_xa/us_pa:5.2f}x")


if __name__ == "__main__":
    main()
