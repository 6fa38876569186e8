"""Where does sphere_100k time go? Time each piece at bench shapes."""
import time
import jax, jax.numpy as jnp, numpy as np

from tuturenderer_tpu.models.scenes import sphere_showcase
from tuturenderer_tpu.camera import primary_ray
from tuturenderer_tpu.options import RenderOptions
from tuturenderer_tpu.ops.pallas.cluster import (
    cluster_intersect, cluster_occluded, sorted_ray_order, _beam_bits,
    _pack_bits, ROWS, LANES)
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
    print(f"{name}: {(time.time()-t0)/3*1000:.1f} ms")
    return out


# primary (coherent) rays
isect = jax.jit(lambda o, d, lv: cluster_intersect(cl, o, d, live=lv))
isect_sorted = jax.jit(lambda o, d, lv: cluster_intersect(cl, o, d,
                                                          sort=True, live=lv))
sortfn = jax.jit(lambda o, d: sorted_ray_order(cl, o, d))
bits = jax.jit(lambda o, d, lv: _pack_bits(
    _beam_bits(cl.aabb, o.x, o.y, o.z, d.x, d.y, d.z, lv, None, ROWS)))

timed("primary intersect (unsorted)", isect, o, d, live)
timed("primary intersect (sorted)", isect_sorted, o, d, live)
timed("sort keys+argsort+scatter", sortfn, o, d)
b = timed("beam_bits+pack", bits, o, d, live)
print("  survive frac primary:", float(jnp.mean(
    ((b[:, :, None] >> jnp.arange(32)) & 1).astype(jnp.float32))))

# incoherent bounce-like rays: random origins on surfaces, random dirs
k = jax.random.PRNGKey(0)
t, idx, bu, bv = jax.block_until_ready(isect(o, d, live))
hitmask = idx >= 0
hp = Vec3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
rd = jax.random.normal(k, (3, n))
rn = jnp.sqrt(rd[0]**2 + rd[1]**2 + rd[2]**2)
d2 = Vec3(rd[0]/rn, rd[1]/rn, rd[2]/rn)
live2 = hitmask
timed("bounce intersect (unsorted)", isect, hp, d2, live2)
timed("bounce intersect (sorted)", isect_sorted, hp, d2, live2)
b2 = timed("bounce beam_bits+pack", bits, hp, d2, live2)
print("  survive frac bounce:", float(jnp.mean(
    ((b2[:, :, None] >> jnp.arange(32)) & 1).astype(jnp.float32))))

# sorted bounce: survive frac after sorting
perm, inv = jax.block_until_ready(sortfn(hp, d2))
g = lambda v: Vec3(v.x[perm], v.y[perm], v.z[perm])
b3 = jax.block_until_ready(bits(g(hp), g(d2), live2[perm]))
print("  survive frac bounce sorted:", float(jnp.mean(
    ((b3[:, :, None] >> jnp.arange(32)) & 1).astype(jnp.float32))))
