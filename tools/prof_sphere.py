"""Where does sphere_100k time go? Time each piece at bench shapes."""
import time
import jax, jax.numpy as jnp, numpy as np

from tuturenderer_tpu.models.scenes import sphere_showcase
from tuturenderer_tpu.camera import primary_ray
from tuturenderer_tpu.ops.pallas.cluster import (
    cluster_intersect, cluster_occluded, sorted_ray_order, _visit_lists,
    ROWS, LANES)
from tuturenderer_tpu.utils.vec import Vec3

scene, cam = sphere_showcase(width=512, height=512)
cl = scene.clusters
print("clusters:", cl.aabb.shape[0], "tris:", scene.n_tris)

n = cam.n_pixels
lane = jnp.arange(n, dtype=jnp.int32)
px = lane % cam.width
py = lane // cam.width
o, d, _ = primary_ray(cam, px, py)
live = jnp.ones((n,), bool)


def timed(name, f, *a):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(3):
        out = jax.block_until_ready(f(*a))
    dt = (time.time() - t0) / 3
    print(f"{name}: {dt*1000:.1f} ms ({n/dt/1e6:.1f} M rays/s)")
    return out


isect = jax.jit(lambda o, d, lv: cluster_intersect(cl, o, d, live=lv))
isect_sorted = jax.jit(lambda o, d, lv: cluster_intersect(cl, o, d,
                                                          sort=True, live=lv))
sortfn = jax.jit(lambda o, d: sorted_ray_order(cl, o, d))
lists = jax.jit(lambda o, d, lv: _visit_lists(
    cl.aabb, o.x, o.y, o.z, d.x, d.y, d.z, lv, None, ROWS))

timed("primary intersect (unsorted)", isect, o, d, live)
timed("primary intersect (sorted)", isect_sorted, o, d, live)
timed("sort keys+argsort+scatter", sortfn, o, d)
vl, ve = timed("visit lists (beam+sort)", lists, o, d, live)
nt = n // (ROWS * LANES)
ve = np.asarray(ve).reshape(nt, -1)
reach = (ve < 3.0e37).sum(1)
print(f"  reachable clusters/tile: mean {reach.mean():.0f} "
      f"p50 {np.percentile(reach, 50):.0f} p95 {np.percentile(reach, 95):.0f}"
      f" max {reach.max()}")

# incoherent bounce-like rays: random origins on surfaces, random dirs
k = jax.random.PRNGKey(0)
t, idx, bu, bv = jax.block_until_ready(isect(o, d, live))
hitmask = idx >= 0
print("  primary hit frac:", float(jnp.mean(hitmask.astype(jnp.float32))))
hp = Vec3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
rd = jax.random.normal(k, (3, n))
rn = jnp.sqrt(rd[0]**2 + rd[1]**2 + rd[2]**2)
d2 = Vec3(rd[0]/rn, rd[1]/rn, rd[2]/rn)
live2 = hitmask
timed("bounce intersect (unsorted)", isect, hp, d2, live2)
timed("bounce intersect (sorted)", isect_sorted, hp, d2, live2)

perm, _ = jax.block_until_ready(sortfn(hp, d2))
g = lambda v: Vec3(v.x[perm], v.y[perm], v.z[perm])
_, ve2 = jax.block_until_ready(lists(g(hp), g(d2), live2[perm]))
ve2 = np.asarray(ve2).reshape(nt, -1)
reach2 = (ve2 < 3.0e37).sum(1)
print(f"  bounce sorted reachable/tile: mean {reach2.mean():.0f} "
      f"p95 {np.percentile(reach2, 95):.0f} max {reach2.max()}")
