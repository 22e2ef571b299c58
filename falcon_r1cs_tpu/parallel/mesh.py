"""Device-mesh construction and sharded witness generation.

The reference has NO distributed machinery (SURVEY.md section 2.4: its only
concurrency is rayon inside arkworks).  This module is the TPU-native
parallelism stack that replaces it:

  DP  ("batch" axis): signatures sharded across devices -- the realization
      of the reference's empty `falcon-aggregate-sig` stub
      (`/root/reference/falcon-aggregate-sig/src/main.rs:1-3`).
  SP  ("coeff" axis): the NTT-stage/coefficient axis sharded across devices
      (the sequence-parallel analog); early butterfly stages exchange
      coefficients across shards -- XLA inserts the all-to-all/ppermute
      collectives from the shardings.
  TP/PP/EP: not applicable to this workload (no weight matrices, no
      pipeline of heterogeneous layers, no experts); documented as N/A
      rather than silently absent.

Collectives ride ICI within a slice via XLA:TPU; multi-host extends the
same mesh over DCN via jax.distributed (no custom transport, by design).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import get_params
from ..witness.engine import generate_witness_ntt


def make_mesh(n_devices: int | None = None, batch_axis: int | None = None):
    """Build a (batch, coeff) mesh over the available devices.

    batch_axis: number of devices on the data-parallel axis (defaults to all
    devices, coeff axis 1).  The coeff axis shards the polynomial
    coefficient dimension.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if batch_axis is None:
        batch_axis = n
    if n % batch_axis:
        raise ValueError(f"{n} devices not divisible by batch axis {batch_axis}")
    arr = np.asarray(devs).reshape(batch_axis, n // batch_axis)
    return Mesh(arr, ("batch", "coeff"))


@functools.lru_cache(maxsize=None)
def sharded_engine(n: int, mesh_key=None):
    """jit-compiled witness engine with batch-DP + coeff-SP shardings.

    mesh_key: the Mesh (hashable) to place shardings on; None = single
    device jit.
    """
    from ..utils.config import get_config
    from ..witness.engine import _seg_dict

    params = get_params(n)
    mesh = mesh_key
    # sharded path: honor an EXPLICIT use_pallas_ntt=True pin; the auto
    # default stays on the XLA path here (no first-call fallback machinery
    # under sharded compilation, and virtual CPU meshes have no Mosaic)
    use_pallas = get_config().use_pallas_ntt is True

    def run(sig, pk_ntt, hm_ntt):
        wb = generate_witness_ntt(
            sig, pk_ntt, hm_ntt, params, use_pallas
        )
        return _seg_dict(wb)

    if mesh is None:
        return jax.jit(run)

    in_spec = NamedSharding(mesh, P("batch", "coeff"))
    # outputs: batch-sharded on the leading batch axis; limb tensors have
    # the limb axis leading so their batch axis is axis 1
    out_specs = {
        "sig": P("batch", "coeff"), "v": P("batch", "coeff"),
        "range_v": P("batch", "coeff", None),
        "sig_ntt_t": P(None, "batch", "coeff"),
        "sig_ntt_b": P("batch", "coeff"),
        "sig_ntt_tail": P("batch", "coeff", None),
        "v_ntt_t": P(None, "batch", "coeff"),
        "v_ntt_b": P("batch", "coeff"),
        "v_ntt_tail": P("batch", "coeff", None),
        "pointwise": P("batch", "coeff", None),
        "norm": P("batch", "coeff", None),
        "bound": P("batch", None),
        "pk_ntt": P("batch", "coeff"), "hm_ntt": P("batch", "coeff"),
    }
    out_shardings = {
        k: NamedSharding(mesh, spec) for k, spec in out_specs.items()
    }
    return jax.jit(
        run,
        in_shardings=(in_spec, in_spec, in_spec),
        out_shardings=out_shardings,
    )


def place_batch(mesh, sig, pk_ntt, hm_ntt):
    """Device-put a host batch with (batch, coeff) sharding."""
    sh = NamedSharding(mesh, P("batch", "coeff"))
    return (
        jax.device_put(sig, sh),
        jax.device_put(pk_ntt, sh),
        jax.device_put(hm_ntt, sh),
    )
