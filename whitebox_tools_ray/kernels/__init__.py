"""Pure-NumPy kernels (no Ray): geometry, grid math, cell indexes, codecs."""
