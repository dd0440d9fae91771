"""Pallas MC kernel vs the XLA gather path (bit-exact, interpret mode).

The two paths share _mc_meta/_mc_combine, so the comparison isolates the
kernel's load/roll/place math vs lax.gather on the same half-pel band.
Reference behavior: edge264_inter.c:1108-1251 clamped-window MC.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import edge264_tpu.ops.jaxdec as J
import edge264_tpu.ops.pallas_mc as PM
from __graft_entry__ import _example_planes


def _mk(mbW, mbH, K, S, seed, frac_unused=0.1, frac_subq=0.3, mvmax=300):
    """Random batched planes + rings with mixed uniform/sub-quadrant mvs,
    unused cells, and mvs overshooting every frame edge."""
    rng = np.random.RandomState(seed)
    BH, BW = 4 * mbH, 4 * mbW
    p1 = {k: np.asarray(v).astype(np.int32)
          for k, v in _example_planes(mbW, mbH).items()}
    ps = []
    for _ in range(K):
        # per-8x8-block uniform mvs, then re-randomize a subset of cells
        mv8 = rng.randint(-mvmax, mvmax + 1, (BH // 2, BW // 2, 2, 2))
        mvs = np.repeat(np.repeat(mv8, 2, 0), 2, 1)
        sub = rng.rand(BH // 2, BW // 2) < frac_subq
        subm = np.repeat(np.repeat(sub, 2, 0), 2, 1)
        mvs = np.where(subm[..., None, None],
                       rng.randint(-mvmax, mvmax + 1, (BH, BW, 2, 2)), mvs)
        rs8 = rng.randint(0, S, (BH // 2, BW // 2, 2))
        rs8 = np.where(rng.rand(BH // 2, BW // 2, 2) < frac_unused,
                       -1, rs8)
        refslot = np.repeat(np.repeat(rs8, 2, 0), 2, 1)
        pp = dict(p1)
        pp["refslot"] = refslot.astype(np.int32)
        pp["mvs"] = mvs.astype(np.int32)
        ps.append(pp)
    p = {k: jnp.stack([jnp.asarray(pp[k]) for pp in ps]) for k in ps[0]}

    # real bands (edge-replicated pads): the uniform arm's joint 8x8
    # clamp is only bit-identical to four per-cell clamps because
    # out-of-frame reads hit replicated columns/rows
    H, W = 16 * mbH, 16 * mbW
    ys = rng.randint(0, 256, (K, S + 1, H, W)).astype(np.uint8)
    cbs = rng.randint(0, 256, (K, S + 1, H // 2, W // 2)).astype(np.uint8)
    crs = rng.randint(0, 256, (K, S + 1, H // 2, W // 2)).astype(np.uint8)
    flat = lambda a: jnp.asarray(a.reshape((-1,) + a.shape[2:]))  # noqa
    L, C = jax.vmap(J.make_ref_planes)(flat(ys), flat(cbs), flat(crs))
    refL = L.reshape((K, S + 1) + L.shape[1:])
    refC = C.reshape((K, S + 1) + C.shape[1:])
    smap = np.zeros((K, 32), np.int32)
    smap[:, :S] = np.arange(S)
    return p, jnp.asarray(refL), jnp.asarray(refC), jnp.asarray(smap)


@pytest.mark.parametrize("has_b", [True, False])
@pytest.mark.parametrize("geom", [(10, 3), (4, 4)])
def test_mc_kernel_matches_gather(has_b, geom):
    mbW, mbH = geom
    K, S = 2, 3
    p, refL, refC, smap = _mk(mbW, mbH, K, S, seed=mbW * 10 + has_b)

    ref = jax.vmap(
        lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, has_b)
    )(p, refL, refC, smap)
    got = PM.mc_frame_batch(p, refL, refC, smap, has_b, mbW, mbH,
                            interpret=True)
    names = ("pred_y", "pred_cb", "pred_cr", "mask_y", "mask_c")
    for n, a, b in zip(names, ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=n)


def test_mc_kernel_all_uniform_and_edge_overshoot():
    """Every block uniform; mvs huge (deep edge clamps both signs)."""
    mbW, mbH = 6, 2
    K, S = 1, 2
    p, refL, refC, smap = _mk(mbW, mbH, K, S, seed=99,
                              frac_subq=0.0, mvmax=3000)
    ref = jax.vmap(
        lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, True)
    )(p, refL, refC, smap)
    got = PM.mc_frame_batch(p, refL, refC, smap, True, mbW, mbH,
                            interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
