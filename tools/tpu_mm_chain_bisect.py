"""Minimal repro + internal bisect of the chained-mont_mul TPU
miscompile (jax 0.9.0 / libtpu 0.0.34, v5e via axon tunnel).

Known from tools/tpu_padd_bisect.py at 2^13: mont_mul(bcast, bcast) is
exact, but U1 = mont_mul(to_mont(X), Z2Z2) diverges with ~32/35 limbs
garbage per row.  This driver (a) finds the minimal chain depth that
diverges, (b) returns every internal of the LAST mont_mul in the chain
(t_full, m, u, s, k, out) to find the first bad tensor.

Run: python tools/tpu_mm_chain_bisect.py [logm]   (PYTHONPATH unset!)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

_PLAT = jax.devices()[0].platform
print(f"default platform: {_PLAT}", flush=True)
assert _PLAT in ("tpu", "axon"), "CPU fallback -- unset PYTHONPATH and rerun"

import numpy as np
import jax.numpy as jnp

import falcon_r1cs_tpu.snark.bls12_381 as bls
from falcon_r1cs_tpu.ops import fq_mont as fq


def both(fn, *args):
    cpu = jax.devices("cpu")[0]
    t = jax.tree.map(np.asarray, jax.jit(fn)(*args))
    with jax.default_device(cpu):
        c = jax.tree.map(np.asarray, jax.jit(fn)(*jax.device_put(args, cpu)))
    return t, c


def report(name, t, c):
    if isinstance(t, dict):
        ok = True
        for k in t:
            if np.array_equal(t[k], c[k]):
                print(f"  {k}: equal", flush=True)
            else:
                d = t[k] != c[k]
                print(f"  {k}: DIVERGES ({d.sum()}/{d.size})", flush=True)
                ok = False
        return ok
    if np.array_equal(t, c):
        print(f"{name}: equal", flush=True)
        return True
    d = t != c
    print(f"{name}: DIVERGES ({d.sum()}/{d.size} elems, "
          f"{np.unique(np.argwhere(d)[:, 0]).size} rows)", flush=True)
    return False


def mont_mul_steps(a, b):
    """mont_mul with every internal returned (mirrors fq.mont_mul)."""
    out = {}
    out["t_full"] = t_full = fq._semi(fq._big_mul(a, b))
    out["m_raw"] = mraw = fq._const_mul(
        t_full[..., : fq.NSIG], fq._T_MU0, fq._T_MU1)
    m = fq._semi(mraw)[..., : fq.NSIG]
    out["m"] = m
    m_ext = jnp.concatenate(
        [m, jnp.zeros(m.shape[:-1] + (fq.NL - fq.NSIG,), m.dtype)], axis=-1)
    out["u"] = u = fq._semi(fq._const_mul(m_ext, fq._T_Q0, fq._T_Q1))
    out["s"] = s = fq._semi_round(t_full + u)
    out["k"] = k = fq._carry_estimate(s[..., : fq.NSIG])
    hi = s[..., fq.NSIG : fq.NSIG + fq.NL]
    spill = s[..., fq.NSIG + fq.NL :]
    top = (hi[..., -1] + (spill[..., 0] << fq.LIMB)
           + (spill[..., 1] << (2 * fq.LIMB)))
    out["out"] = jnp.concatenate(
        [hi[..., 0:1] + k[..., None], hi[..., 1:-1], top[..., None]],
        axis=-1)
    return out


def main():
    logm = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    m = 1 << logm
    rng = np.random.default_rng(3)
    a = fq.int_to_limbs(
        [int.from_bytes(rng.bytes(47), "little") % bls.P for _ in range(64)])
    b = fq.int_to_limbs(
        [int.from_bytes(rng.bytes(47), "little") % bls.P for _ in range(64)])
    A = jnp.asarray(np.tile(a, (m // 64, 1)))
    B = jnp.asarray(np.tile(b, (m // 64, 1)))

    print(f"width 2^{logm}", flush=True)
    report("depth1  mont_mul(A,B)", *both(fq.mont_mul, A, B))
    report("depth2  mm(mm(A,B),B)",
           *both(lambda x, y: fq.mont_mul(fq.mont_mul(x, y), y), A, B))
    report("depth3  mm(mm(mm(A,B),B),B)",
           *both(lambda x, y: fq.mont_mul(
               fq.mont_mul(fq.mont_mul(x, y), y), y), A, B))

    print("internals of the LAST mul in depth2:", flush=True)
    t, c = both(lambda x, y: mont_mul_steps(fq.mont_mul(x, y), y), A, B)
    report("", t, c)


if __name__ == "__main__":
    main()
