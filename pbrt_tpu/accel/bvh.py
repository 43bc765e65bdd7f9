"""BVH accelerator.

Placeholder alias while the LBVH + stackless traversal kernel lands:
falls back to the chunked brute-force sweep, which shares the same hit
contract.  Replaced by a real linear-BVH in pbrt_tpu.accel (milestone:
Pallas traversal kernel).
"""

from pbrt_tpu.ops.intersect import BruteForceIntersector


class BVHIntersector(BruteForceIntersector):
    pass
