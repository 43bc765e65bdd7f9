"""Round-4 on-chip A/B: sorted-carry decomposition on BASELINE config 3.

Variants (each a full end-to-end frame — micro-probes through the tunnel
have repeatedly lied, RESULTS.md):
  A. sorted-carry OFF (r3 behavior: sort/unsort around every intersect)
  B. sorted-carry ON  (one argsort + packed row-gather per bounce)
  C. sorted-carry ON, shadows re-sorted (isolates "are unsorted shadow
     wavefronts eating the machinery savings?")

Also times the three candidate permutation primitives at wavefront shape
(262144 lanes, 21 carry columns) as ordinal hints:
  P1 argsort + stack-pack + [N,21] row gather + unpack  (current)
  P2 lax.sort multi-operand co-sort (22 operands)
  P3 argsort + per-array [N,3]/[N,2] row gathers
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    dts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        dts.append(time.time() - t0)
    return sorted(dts)[len(dts) // 2]


def frame(tag):
    from pbrt_tpu.testscenes import mesh_scene_renderer

    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=8, maxdepth=4, ray_batch=1 << 18
    )
    state = r.render(progress=False)  # compile
    dts = []
    for _ in range(3):
        t0 = time.time()
        state = r.render(state=r.film.initial_state(), progress=False)
        jax.block_until_ready(state["weight"])
        dts.append(time.time() - t0)
    dt = sorted(dts)[1]
    rays = 256 * 256 * 8 * 7
    print(f"{tag}: {dt*1000:.1f} ms/frame = {rays/dt/1e6:.2f} Mray/s "
          f"(spread {min(dts)*1000:.0f}-{max(dts)*1000:.0f})", flush=True)


def perm_probes():
    n = 1 << 18
    c = 21
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int64).astype(np.uint32))
    cols = [jnp.asarray(rng.random(n, np.float32)) for _ in range(c)]

    @jax.jit
    def p1(keys, *cols):
        order = jnp.argsort(keys)
        packed = jnp.stack(cols, axis=-1)[order]
        return [packed[:, i] for i in range(c)]

    @jax.jit
    def p2(keys, *cols):
        out = jax.lax.sort((keys,) + cols, num_keys=1)
        return out[1:]

    @jax.jit
    def p3(keys, *cols):
        order = jnp.argsort(keys)
        groups = [jnp.stack(cols[i:i + 3], -1)[order] for i in range(0, c, 3)]
        return groups

    @jax.jit
    def p0(keys, *cols):
        order = jnp.argsort(keys)
        return order

    for tag, fn in (("P0 argsort only", p0), ("P1 pack+gather", p1),
                    ("P2 lax.sort co-sort", p2), ("P3 per-array gathers", p3)):
        dt = timed(fn, keys, *cols)
        print(f"{tag}: {dt*1000:.2f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    os.environ["PBRT_TPU_NO_SORTED_CARRY"] = "1"
    frame("A sc-off")
    os.environ["PBRT_TPU_NO_SORTED_CARRY"] = "0"
    frame("B sc-on")
    # historical note: variant C originally used PBRT_TPU_SC_SORT_SHADOW=1
    # to FORCE shadow sorting when the default was unsorted; after the C>B
    # result, sorted shadows became the default and the env flag inverted
    # to PBRT_TPU_SC_NOSORT_SHADOW (see integrators/path.py).  Re-running
    # this script today measures C == B.
    frame("C sc-on+sorted-shadows (now the default)")
    perm_probes()


if __name__ == "__main__":
    main()
