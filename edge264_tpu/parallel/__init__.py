"""Multi-chip / multi-host scaling: mesh-sharded frame decode (frame/GOP
data parallelism) and, later, slice-parallel decode with ICI exchange of
reconstructed reference tiles (SURVEY.md §5)."""

from .mesh import make_decode_mesh, decode_batch_sharded  # noqa: F401
