"""Pixel-path ops: numpy golden oracle + JAX/Pallas device kernels."""
