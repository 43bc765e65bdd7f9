"""Acceleration structures: LBVH build (host) + device traversal."""
