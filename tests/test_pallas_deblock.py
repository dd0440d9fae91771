"""Pallas deblocking kernel vs the XLA sheared scan (interpret mode on
CPU; the TPU path is exercised by bench tooling)."""

import numpy as np
import jax.numpy as jnp
import pytest

import edge264_tpu.ops.jaxdec as J
from edge264_tpu.ops.pallas_deblock import deblock_pallas


@pytest.mark.parametrize("seed", [7, 21])
def test_pallas_matches_sheared(seed):
    rng = np.random.RandomState(seed)
    mbW, mbH = 6, 4
    H, W = mbH * 16, mbW * 16
    y = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2))
                     .astype(np.int32))
    cr = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2))
                     .astype(np.int32))
    db = np.full((mbH, mbW), 7)
    db[:, 0] &= ~1
    db[0, :] &= ~2
    p = {
        "qp": jnp.asarray(rng.randint(10, 45, (mbH, mbW, 4))
                          .astype(np.int32)),
        "deblock_ab": jnp.asarray(rng.randint(-2, 3, (mbH, mbW, 2))
                                  .astype(np.int32)),
        "deblock": jnp.asarray(db.astype(np.int32)),
        "mb_flags": jnp.asarray((rng.randint(0, 2, (mbH, mbW))
                                 * (J.MBF_INTRA | J.MBF_T8x8))
                                .astype(np.int32)),
    }
    bs_v = jnp.asarray(rng.randint(0, 5, (mbH * 4, mbW * 4))
                       .astype(np.int32))
    bs_h = jnp.asarray(rng.randint(0, 5, (mbH * 4, mbW * 4))
                       .astype(np.int32))
    ref = J.deblock_scan(y, cb, cr, p, bs_v, bs_h, mbW, mbH)
    got = deblock_pallas(y, cb, cr, p, bs_v, bs_h, mbW, mbH,
                         interpret=True)
    for name, a, b in zip("y cb cr".split(), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
