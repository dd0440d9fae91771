"""Lockstep-batched Pallas wavefront kernels (K frames per wave step)
vs the single-frame XLA sheared scans, interpret mode on CPU.

PROCESS ISOLATION: late in a long suite run, XLA:CPU crashes hard
(SIGSEGV/SIGABRT inside backend_compile_and_load) while compiling the
sheared scan for this file — the identical tests pass in a fresh
process, so the crash is accumulated jaxlib compile state, not these
tests.  The suite therefore runs this file in a SUBPROCESS: the real
tests are skipped in the parent and executed by
test_pallas_batch_isolated below."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import edge264_tpu.ops.jaxdec as J
from edge264_tpu.ops.pallas_deblock import deblock_pallas_batch
from edge264_tpu.ops.pallas_intra import intra_pallas_batch

_ISOLATED = bool(os.environ.get("E264T_ISOLATED_PALLAS_BATCH"))
_in_parent = pytest.mark.skipif(
    not _ISOLATED, reason="runs in the isolated subprocess "
    "(test_pallas_batch_isolated)")


@pytest.mark.skipif(_ISOLATED, reason="parent-only wrapper")
def test_pallas_batch_isolated():
    env = dict(os.environ, E264T_ISOLATED_PALLAS_BATCH="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", __file__],
        env=env, timeout=2400, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]


def _stack(seed, mbW, mbH, K):
    """Stacked syntax planes; lane pixel content differs via the random
    y/residual inputs (mode planes are shared — cross-lane leakage is
    still caught because a leaked value differs from the zero fill)."""
    from __graft_entry__ import _example_planes
    p = {kk: v.astype(jnp.int32)
         for kk, v in _example_planes(mbW, mbH).items()}
    return {kk: jnp.stack([v] * K) for kk, v in p.items()}


@_in_parent
@pytest.mark.parametrize("K", [2, 3])
def test_batched_intra_matches_sheared(K):
    mbW, mbH = 5, 4
    rng = np.random.RandomState(3)
    p = _stack(3, mbW, mbH, K)
    H, W = mbH * 16, mbW * 16
    mk = lambda h, w, lo, hi: jnp.asarray(
        rng.randint(lo, hi, (K, h, w)).astype(np.int32))
    y = mk(H, W, 0, 255)
    cb = mk(H // 2, W // 2, 0, 255)
    cr = mk(H // 2, W // 2, 0, 255)
    ry = mk(H, W, -40, 40)
    rcb = mk(H // 2, W // 2, -40, 40)
    rcr = mk(H // 2, W // 2, -40, 40)
    got = intra_pallas_batch(y, cb, cr, ry, rcb, rcr, p, mbW, mbH,
                             interpret=True)
    for k in range(K):
        pk = {kk: v[k] for kk, v in p.items()}
        ref = J.intra_scan_sheared(y[k], cb[k], cr[k], ry[k], rcb[k],
                                   rcr[k], pk, mbW, mbH)
        for name, a, b in zip("y cb cr".split(), ref,
                              [g[k] for g in got]):
            assert np.array_equal(np.asarray(a), np.asarray(b)), \
                f"lane {k} {name}"


@_in_parent
@pytest.mark.parametrize("K", [2])
def test_batched_deblock_matches_sheared(K):
    rng = np.random.RandomState(17)
    mbW, mbH = 6, 4
    H, W = mbH * 16, mbW * 16
    mk = lambda shape, lo, hi: jnp.asarray(
        rng.randint(lo, hi, shape).astype(np.int32))
    y = mk((K, H, W), 0, 255)
    cb = mk((K, H // 2, W // 2), 0, 255)
    cr = mk((K, H // 2, W // 2), 0, 255)
    db = np.full((K, mbH, mbW), 7)
    db[:, :, 0] &= ~1
    db[:, 0, :] &= ~2
    p = {
        "qp": mk((K, mbH, mbW, 4), 10, 45),
        "deblock_ab": mk((K, mbH, mbW, 2), -2, 3),
        "deblock": jnp.asarray(db.astype(np.int32)),
        "mb_flags": jnp.asarray(
            (rng.randint(0, 2, (K, mbH, mbW))
             * (J.MBF_INTRA | J.MBF_T8x8)).astype(np.int32)),
    }
    bs_v = mk((K, mbH * 4, mbW * 4), 0, 5)
    bs_h = mk((K, mbH * 4, mbW * 4), 0, 5)
    got = deblock_pallas_batch(y, cb, cr, p, bs_v, bs_h, mbW, mbH,
                               interpret=True)
    for k in range(K):
        pk = {kk: v[k] for kk, v in p.items()}
        ref = J.deblock_scan(y[k], cb[k], cr[k], pk, bs_v[k], bs_h[k],
                             mbW, mbH)
        for name, a, b in zip("y cb cr".split(), ref,
                              [g[k] for g in got]):
            assert np.array_equal(np.asarray(a), np.asarray(b)), \
                f"lane {k} {name}"
