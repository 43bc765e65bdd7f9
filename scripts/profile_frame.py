"""Whole-frame scaling: isolate per-bounce and per-sample costs (1 jit each)."""
import time
import jax
from pbrt_tpu.testscenes import cornell_renderer


def frame(r, spp):
    st = r.render(spp=spp, progress=False)  # compile+warm
    t0 = time.time()
    st = r.render(spp=spp, state=r.film.initial_state(), progress=False)
    jax.block_until_ready(st["weight"])
    return time.time() - t0


for spp, md in ((8, 5), (8, 1), (8, 2), (32, 5)):
    r = cornell_renderer(xres=256, yres=256, spp=spp, maxdepth=md,
                         ray_batch=1 << 18)
    dt = frame(r, spp)
    n_rays = 256 * 256 * spp * (2 * md - 1)
    print(f"spp={spp:3d} maxdepth={md}: {dt*1e3:7.2f} ms "
          f"({n_rays/dt/1e6:6.1f} Mray/s)", flush=True)
