"""Per-op device profile of the flagship witness engine (VERDICT r2 #8).

Runs jitted_engine(n) at the bench batch on the real chip, captures a
jax.profiler trace, and prints the "XLA Ops" rows grouped by op name so
the 2x-kernel + packing-tail split can be attacked with data instead of
guesses.

Run: python tools/profile_engine.py [n] [batch]   (PYTHONPATH unset —
setting it breaks axon TPU discovery on this image)
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import jax

    from falcon_r1cs_tpu.params import Q
    from falcon_r1cs_tpu.witness import jitted_engine

    rng = np.random.default_rng(0)
    sig = rng.integers(0, Q, size=(batch, n), dtype=np.int32)
    pk = rng.integers(0, Q, size=(batch, n), dtype=np.int32)
    hm = rng.integers(0, Q, size=(batch, n), dtype=np.int32)
    run = jitted_engine(n)
    jax.block_until_ready(run(sig, pk, hm))  # compile + warm

    tmp = tempfile.mkdtemp(prefix="engprof_")
    with jax.profiler.trace(tmp):
        for _ in range(4):
            jax.block_until_ready(run(sig, pk, hm))

    # parse: per-op rows live on the "XLA Ops" thread of the device pid
    path = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                     recursive=True)[0]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_names, pid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"]["name"]
    by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        dur = e.get("dur", 0) / 4.0  # 4 iterations
        by_op[e["name"]] += dur
        total += dur
    print(f"engine n={n} batch={batch}: {total:.0f} us/batch device "
          f"({batch/total*1e6:,.0f} wit/s)\n")
    for name, us in by_op.most_common(25):
        print(f"{us:9.1f} us  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
