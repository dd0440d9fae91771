"""Pallas deblocking kernel vs the XLA sheared scan (interpret mode on
CPU; the TPU path is exercised by bench tooling)."""

import numpy as np
import jax.numpy as jnp
import pytest

import edge264_tpu.ops.jaxdec as J
import edge264_tpu.ops.pallas_deblock as PD
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


def _rand_frame(rng, mbW, mbH):
    H, W = mbH * 16, mbW * 16
    y = rng.randint(0, 255, (H, W)).astype(np.int32)
    cb = rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32)
    cr = rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32)
    db = np.full((mbH, mbW), 7)
    db[:, 0] &= ~1
    db[0, :] &= ~2
    p = {
        "qp": rng.randint(10, 45, (mbH, mbW, 4)).astype(np.int32),
        "deblock_ab": rng.randint(-2, 3, (mbH, mbW, 2)).astype(np.int32),
        "deblock": db.astype(np.int32),
        "mb_flags": (rng.randint(0, 2, (mbH, mbW))
                     * (J.MBF_INTRA | J.MBF_T8x8)).astype(np.int32),
    }
    bs_v = rng.randint(0, 5, (mbH * 4, mbW * 4)).astype(np.int32)
    bs_h = rng.randint(0, 5, (mbH * 4, mbW * 4)).astype(np.int32)
    return y, cb, cr, p, bs_v, bs_h


def test_batch_chunking_matches_sheared(monkeypatch):
    """Scoped-VMEM chunking (round-3 1080p x 8-lane OOM fix): a batch
    whose K*mbH exceeds _ROWS_MAX splits into several pallas_calls that
    must concatenate back bit-exactly.  _ROWS_MAX is lowered so the
    split triggers at test size (K=5, mbH=4 -> chunks of 2+2+1)."""
    monkeypatch.setattr(PD, "_ROWS_MAX", 8)
    rng = np.random.RandomState(3)
    mbW, mbH, K = 6, 4, 5
    frames = [_rand_frame(rng, mbW, mbH) for _ in range(K)]
    ys = jnp.asarray(np.stack([f[0] for f in frames]))
    cbs = jnp.asarray(np.stack([f[1] for f in frames]))
    crs = jnp.asarray(np.stack([f[2] for f in frames]))
    p = {k: jnp.asarray(np.stack([f[3][k] for f in frames]))
         for k in frames[0][3]}
    bs_v = jnp.asarray(np.stack([f[4] for f in frames]))
    bs_h = jnp.asarray(np.stack([f[5] for f in frames]))
    got = PD.deblock_pallas_batch(ys, cbs, crs, p, bs_v, bs_h, mbW, mbH,
                                  interpret=True)
    for k, (y, cb, cr, pp, bv, bh) in enumerate(frames):
        ref = J.deblock_scan(jnp.asarray(y), jnp.asarray(cb),
                             jnp.asarray(cr),
                             {kk: jnp.asarray(v) for kk, v in pp.items()},
                             jnp.asarray(bv), jnp.asarray(bh), mbW, mbH)
        for name, a, b in zip("y cb cr".split(), ref,
                              (got[0][k], got[1][k], got[2][k])):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (k, name)
