"""Mesh-sharded decoding.

The decoder's embarrassingly-parallel axis is the *frame/GOP* axis: closed
GOPs are independent, and intra frames are always independent (the
reference exploits the same structure with frame-level tasks,
edge264_headers.c:1275-1277; here chips replace threads).  A batch of
frames' syntax planes is sharded over the mesh's "gop" axis; each device
runs the full per-frame pixel path (residual + intra wavefront + deblock)
on its shard.  Inter frames add a reference-exchange step over ICI — that
lands with the MC milestone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import jaxdec


def make_decode_mesh(devices=None, axis: str = "gop") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


@functools.partial(jax.jit, static_argnames=("mbW", "mbH"))
def _decode_batch(p, sm4, sm8, mbW, mbH):
    """vmapped whole-frame pixel path over a leading frame axis."""
    fn = lambda pp: jaxdec.decode_frame_jit(pp, sm4, sm8, mbW, mbH)
    return jax.vmap(fn)(p)


def decode_batch_sharded(p_batch, sm4, sm8, mbW, mbH, mesh: Mesh,
                         axis: str = "gop"):
    """Decode a batch of frames with the batch axis sharded over the mesh.

    p_batch: dict of stacked syntax planes with leading frame axis (size
    divisible by mesh size).  Returns (y, cb, cr) stacked uint8 arrays."""
    sharding = NamedSharding(mesh, P(axis))
    p_dev = {k: jax.device_put(v, sharding) for k, v in p_batch.items()}
    return _decode_batch(p_dev, sm4, sm8, mbW, mbH)
