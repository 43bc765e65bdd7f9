"""Differentiable rendering: pixel gradients w.r.t. scene parameters."""
