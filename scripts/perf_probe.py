"""Probe dispatch latency vs device throughput on the attached TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from pbrt_tpu.testscenes import cornell_renderer


def run(xres, spp, batch, label):
    r = cornell_renderer(xres=xres, yres=xres, spp=spp, maxdepth=5, ray_batch=batch)
    state = r.render(spp=1, progress=False)  # compile
    t0 = time.time()
    state = r.render(spp=spp, state=r.film.initial_state(), progress=False)
    jax.block_until_ready(state["weight"])
    dt = time.time() - t0
    n_pix = r.film.get_sample_bounds().area()
    rays = n_pix * spp * 9
    n_disp = -(-n_pix * spp // batch)
    print(
        f"{label}: {dt:.3f}s  {rays/dt/1e6:.1f} Mrays/s  dispatches={n_disp} "
        f"({dt/n_disp*1000:.1f} ms/dispatch)",
        flush=True,
    )


if __name__ == "__main__":
    run(256, 4, 1 << 18, "256px 4spp 1-dispatch")
    run(256, 16, 1 << 18, "256px 16spp 4-dispatch")
    run(512, 16, 1 << 20, "512px 16spp 4-dispatch")
    run(512, 16, 1 << 22, "512px 16spp 1-dispatch")
