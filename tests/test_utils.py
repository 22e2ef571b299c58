"""Coverage for the measurement utilities."""

import numpy as np

from falcon_r1cs_tpu.utils.profiling import throughput
from falcon_r1cs_tpu.witness.layout import export_witness_limbs
from falcon_r1cs_tpu.witness import interleave_witness, jitted_engine
from falcon_r1cs_tpu.falcon import make_instance, ntt
from falcon_r1cs_tpu.params import FALCON_512


def test_throughput_slope():
    import jax
    import jax.numpy as jnp

    # a non-trivial op so the iteration slope is reliably positive even on
    # a fast host (a near-zero slope on a toy op can be lost to timer noise)
    f = jax.jit(lambda x: jnp.sin(x @ x).sum())
    rate, det = throughput(
        f, (jnp.ones((256, 256)),), items_per_call=1, iters=(1, 16), trials=3
    )
    assert rate > 0
    assert 1 <= len(det["rates"]) <= 3


def test_export_witness_limbs_host_path(rng):
    """The host limb exporter (reference implementation; the device packer
    is the production path) agrees with the interleaver."""
    inst = make_instance(rng, FALCON_512)
    seg = {
        k: np.asarray(v)
        for k, v in jitted_engine(512)(
            inst.sig_lifted[None].astype(np.int32),
            ntt(inst.h)[None].astype(np.int32),
            ntt(inst.hm)[None].astype(np.int32),
        ).items()
    }
    limbs = export_witness_limbs(seg, FALCON_512)
    flat = interleave_witness(seg, FALCON_512)
    vals = np.zeros(limbs.shape[:2], dtype=object)
    for k in range(4, -1, -1):
        vals = (vals << 32) + limbs[:, :, k].astype(object)
    assert (vals == flat).all()
