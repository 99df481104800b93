"""Interpret-mode regression for the parked Pallas VMEM-resident conv
kernel (ops/pallas/gather_conv.py) — keeps it correct until the
toolchain's AOT compiler accepts tpu.dynamic_gather (see CLAUDE.md)."""

import numpy as np

import jax
import jax.numpy as jnp

from occuseg_tpu.core import topology as T
from occuseg_tpu.ops.conv import gather_conv
from occuseg_tpu.ops.pallas.gather_conv import gather_conv_pallas, supported

from tests.utils import random_points


def test_pallas_conv_interpret_matches_xla():
    rng = np.random.default_rng(5)
    N, cin, cout = 256, 128, 128
    pts = random_points(rng, 180, extent=16, batch_size=1, pad_to=N)
    keys, _ = T.voxelize_coords(jnp.asarray(pts), N)
    lvl = T.build_level(keys, kernel=3)
    nbr = np.asarray(lvl.nbr)

    feats = rng.standard_normal((N, cin)).astype(np.float32)
    w = (rng.standard_normal((27, cin, cout)) * 0.1).astype(np.float32)

    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr),
                                 jnp.asarray(w)))
    got = np.asarray(gather_conv_pallas(
        jnp.asarray(feats), jnp.asarray(nbr.T.copy()), jnp.asarray(w),
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert supported(N, cin, cout, 27, jnp.float32) in (True, False)
