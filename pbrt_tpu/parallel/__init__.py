"""Device-mesh parallelism: SPMD rendering and gradient steps."""
