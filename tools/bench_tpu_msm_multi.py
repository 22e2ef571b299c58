"""K-fold TPU MSM at the Groth16 H-query shape (VERDICT r2 Next #1b).

Runs g1_msm_tpu_multi over the falcon-512 h_query points (n_pad = 2^17)
with K full-width scalar vectors and reports ms/MSM + effective modmul/s,
against the host C backend's number for the same shape.

Run: python tools/bench_tpu_msm_multi.py [K] [iters]   (PYTHONPATH unset)
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
assert _PLAT in ("tpu", "axon"), (
    "CPU fallback -- unset PYTHONPATH (it breaks axon TPU discovery)")

import falcon_r1cs_tpu.snark.bls12_381 as bls
from falcon_r1cs_tpu.r1cs.coo import cache_dir
from falcon_r1cs_tpu.snark import native_backend as nb
from falcon_r1cs_tpu.snark import tpu_msm
from falcon_r1cs_tpu.snark.groth16 import load_pk
from falcon_r1cs_tpu.snark.points import ints_to_limbs


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pk = load_pk(cache_dir() / "FalconNTTVerificationCircuit_512.pk.npz")
    pts = pk.h_query
    n = len(pts)
    rng = np.random.default_rng(1)
    scalars = [
        ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % bls.R
             for _ in range(n)], 4,
        )
        for _ in range(K)
    ]

    got = tpu_msm.g1_msm_tpu_multi(pts, scalars)  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        got = tpu_msm.g1_msm_tpu_multi(pts, scalars)
    dt = (time.perf_counter() - t0) / iters
    # correctness spot-check vs the host backend (first + last vector)
    if nb.available():
        assert got[0] == nb.g1_msm(pts, scalars[0])
        assert got[-1] == nb.g1_msm(pts, scalars[-1])
        t0 = time.perf_counter()
        host = nb.g1_msm_multi(pts, np.stack(scalars))
        t_host = time.perf_counter() - t0
        assert host == got
        print(f"host msm_multi K={K}: {t_host:6.2f}s "
              f"({t_host/K*1e3:7.1f} ms/MSM)")
    nw = (255 + tpu_msm.WINDOW - 1) // tpu_msm.WINDOW
    # ~16 Fq muls per complete Jacobian add, n*nw adds per MSM (sort and
    # bucket phases excluded -> conservative modmul estimate)
    modmul = 16 * n * nw * K / dt
    print(f"tpu  msm_multi K={K}: {dt:6.2f}s ({dt/K*1e3:7.1f} ms/MSM, "
          f"~{modmul/1e6:.1f}M modmul/s)")

    # device-profiled rate: the wall number above includes the drifting
    # tunnel (digit upload ~0.35 MB/window) and the host fold; the trace
    # isolates what the chip itself spends (utils/profiling discipline)
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    import jax

    tmp = tempfile.mkdtemp(prefix="msm_multi_prof_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                tpu_msm.g1_msm_tpu_multi(pts, scalars)
        path = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                         recursive=True)[0]
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        tid_names = {
            (e["pid"], e["tid"]): e["args"]["name"]
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"
        }
        # UNION of event intervals, not sum of durations: the lax.map
        # `while` op is emitted as one event spanning the whole loop AND
        # its inner ops are emitted individually — a naive sum counts
        # the loop body twice (observed: "device" 1.65 s vs wall 1.51 s)
        spans = sorted(
            (e["ts"], e["ts"] + e.get("dur", 0))
            for e in data["traceEvents"]
            if e.get("ph") == "X"
            and tid_names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
        )
        busy = 0.0
        cur_s = cur_e = None
        for s, t in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, t
            else:
                cur_e = max(cur_e, t)
        if cur_e is not None:
            busy += cur_e - cur_s
        dev_us = busy / iters
        print(f"tpu  msm_multi K={K}: device {dev_us/1e6:6.3f}s "
              f"({dev_us/1e3/K:7.1f} ms/MSM device)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
