#!/usr/bin/env python3
"""One-command live-hardware validation (the TPU counterpart of the
hermetic CPU test suite, which forces the CPU platform).

Checks, on the real device:
  1. auto-backend engine bit-exactness vs the host trace (verifies the
     Pallas limb-NTT path end-to-end on hardware);
  2. dual-engine bit-exactness;
  3. device-profiled throughput for the headline engine.

    python tools/tpu_live_check.py
"""

import os

# persistent XLA compile cache: multi-minute wide-tree MSM compiles
# survive across tool/bench processes (bench.py uses the same dir)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({len(jax.devices())} device(s))")

    from falcon_r1cs_tpu import (
        ConstraintSystem,
        FalconDualNTTVerificationCircuit,
        FalconNTTVerificationCircuit,
    )
    from falcon_r1cs_tpu.falcon import make_instance, ntt
    from falcon_r1cs_tpu.params import FALCON_512, Q
    from falcon_r1cs_tpu.witness import (
        interleave_witness,
        interleave_witness_dual,
        jitted_engine,
        jitted_engine_dual,
    )

    rng = np.random.default_rng(0)
    inst = make_instance(rng, FALCON_512)
    sig = inst.sig_lifted[None].astype(np.int32)
    pk_ntt = ntt(inst.h)[None].astype(np.int32)
    hm_ntt = ntt(inst.hm)[None].astype(np.int32)

    seg = {k: np.asarray(v) for k, v in
           jitted_engine(512)(sig, pk_ntt, hm_ntt).items()}
    cs = ConstraintSystem()
    FalconNTTVerificationCircuit.build_circuit(inst).generate_constraints(cs)
    ok1 = [int(x) for x in interleave_witness(seg, FALCON_512)[0]] == (
        cs.witness_values
    )
    print(f"ntt engine bit-exact on {platform}: {ok1}")

    seg = {k: np.asarray(v) for k, v in jitted_engine_dual(512)(
        inst.sig_signed[None].astype(np.int32), pk_ntt, hm_ntt).items()}
    cs = ConstraintSystem()
    FalconDualNTTVerificationCircuit.build_circuit(inst).generate_constraints(cs)
    ok2 = [int(x) for x in interleave_witness_dual(seg, FALCON_512)[0]] == (
        cs.witness_values
    )
    print(f"dual engine bit-exact on {platform}: {ok2}")

    # Pallas Fq kernel bit-equality on hardware (one 1024-row block;
    # ~2 s compile — the MSM point-arithmetic path's live smoke)
    import jax.numpy as jnp

    import falcon_r1cs_tpu.ops.fq_mont as fq
    import falcon_r1cs_tpu.ops.pallas_fq as pfq

    rng2 = np.random.default_rng(7)
    a = jnp.asarray(fq.int_to_limbs(
        [int.from_bytes(rng2.bytes(47), "little") % fq.Q381
         for _ in range(1024)]))
    b = jnp.asarray(fq.int_to_limbs(
        [int.from_bytes(rng2.bytes(47), "little") % fq.Q381
         for _ in range(1024)]))
    got = np.asarray(pfq.from_blocks(
        pfq.mont_mul_pallas(pfq.to_blocks(a), pfq.to_blocks(b))))
    ok3 = np.array_equal(got, np.asarray(fq.mont_mul(a, b)))
    print(f"pallas fq mont_mul bit-exact on {platform}: {ok3}")

    from bench import bench_witnesses_device

    rate = bench_witnesses_device()
    print(f"device-profiled headline: "
          f"{rate:,.0f} wit/s" if rate else "device profiling unavailable")
    if not (ok1 and ok2 and ok3):
        sys.exit(1)
    print("tpu live check: PASS")


if __name__ == "__main__":
    main()
