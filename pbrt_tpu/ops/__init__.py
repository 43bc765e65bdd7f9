"""Device compute ops: intersection, traversal kernels."""
