"""Per-op device profile of the Pallas (blocks) TPU MSM engine.

Runs one g1_msm_tpu call at the falcon-512 h_query shape (or a given
n) through snark/tpu_msm_blocks.py on the real chip, captures a
jax.profiler trace, and prints the "XLA Ops" rows grouped by op name so
the residual glue around the point kernels (sort / gather / scatter /
selects) can be attacked with data instead of guesses.

Run: python tools/profile_msm.py [log2_n] [iters]   (PYTHONPATH unset —
setting it breaks axon TPU discovery on this image)
"""

import collections
import glob
import gzip
import json
import os
# persistent XLA compile cache: multi-minute wide-tree MSM compiles
# survive across tool/bench processes (bench.py uses the same dir)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    print(f"platform: {plat}", flush=True)
    assert plat in ("tpu", "axon"), (
        "CPU fallback -- unset PYTHONPATH (it breaks axon TPU discovery)")

    import falcon_r1cs_tpu.snark.bls12_381 as bls
    from falcon_r1cs_tpu.r1cs.coo import cache_dir
    from falcon_r1cs_tpu.snark import tpu_msm
    from falcon_r1cs_tpu.snark.groth16 import load_pk
    from falcon_r1cs_tpu.snark.points import ints_to_limbs

    pk = load_pk(cache_dir() / "FalconNTTVerificationCircuit_512.pk.npz")
    pts = pk.h_query
    n = min(len(pts), 1 << log2n)
    if n < len(pts):
        from falcon_r1cs_tpu.snark.points import G1Array

        pts = G1Array(pts.xs[:n], pts.ys[:n], pts.inf[:n])
    rng = np.random.default_rng(7)
    scalars = ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % bls.R for _ in range(n)],
        4,
    )

    got = tpu_msm.g1_msm_tpu(pts, scalars, use_pallas=True)  # compile+warm
    import time

    t0 = time.perf_counter()
    got = tpu_msm.g1_msm_tpu(pts, scalars, use_pallas=True)
    print(f"warm wall: {time.perf_counter()-t0:.2f}s  result={got is not None}")

    from falcon_r1cs_tpu.snark import native_backend as nb

    if nb.available():
        t0 = time.perf_counter()
        want = nb.g1_msm(pts, scalars)
        t_c = time.perf_counter() - t0
        print(f"host C: {t_c*1e3:.1f} ms  match={got == want}")
        assert got == want, "TPU MSM != host C"

    tmp = tempfile.mkdtemp(prefix="msmprof_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            tpu_msm.g1_msm_tpu(pts, scalars, use_pallas=True)

    path = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                     recursive=True)[0]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
    by_op = collections.Counter()
    meta = {}
    spans = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        dur = e.get("dur", 0) / iters
        by_op[e["name"]] += dur
        if e["name"] not in meta and e.get("args"):
            meta[e["name"]] = e["args"]
        spans.append((e["ts"], e["ts"] + e.get("dur", 0)))
    # total = interval UNION (a `while` row spans its whole loop AND the
    # inner ops are emitted individually — a sum double-counts them);
    # the per-op table keeps raw per-name sums for attribution
    spans.sort()
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
    total = busy / iters
    print(f"MSM n=2^{log2n}: {total/1e6:.3f} s/MSM device (busy-union)\n")
    for name, us in by_op.most_common(30):
        a = meta.get(name, {})
        detail = str(
            a.get("long_name") or a.get("tf_op") or a.get("source") or ""
        )[:90]
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  {name[:40]}  {detail}")
    # one full args dump for the top entry, to learn the metadata schema
    if by_op:
        top = by_op.most_common(1)[0][0]
        print("\ntop-op args:", json.dumps(meta.get(top, {}))[:600])


if __name__ == "__main__":
    main()
