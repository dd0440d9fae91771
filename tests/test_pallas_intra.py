"""Pallas intra-wavefront kernel vs the XLA sheared scan (interpret mode
on CPU; bit-exactness on the real TPU is asserted by tools/profile_stages
and the bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

import edge264_tpu.ops.jaxdec as J
from edge264_tpu.ops.pallas_intra import intra_pallas


def _planes(seed, mbW, mbH):
    from __graft_entry__ import _example_planes
    p = _example_planes(mbW, mbH)
    return {k: v.astype(jnp.int32) for k, v in p.items()}


@pytest.mark.parametrize("seed,mbW,mbH", [(0, 6, 4), (1, 5, 3)])
def test_pallas_intra_matches_sheared(seed, mbW, mbH):
    rng = np.random.RandomState(seed)
    p = _planes(seed, mbW, mbH)
    H, W = mbH * 16, mbW * 16
    y = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))
    ry = jnp.asarray(rng.randint(-40, 40, (H, W)).astype(np.int32))
    rcb = jnp.asarray(rng.randint(-40, 40, (H // 2, W // 2)).astype(np.int32))
    rcr = jnp.asarray(rng.randint(-40, 40, (H // 2, W // 2)).astype(np.int32))
    ref = J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH)
    got = intra_pallas(y, cb, cr, ry, rcb, rcr, p, mbW, mbH, interpret=True)
    for name, a, b in zip("y cb cr".split(), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
