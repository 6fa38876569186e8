"""Per-stage timing of one sphere_100k bounce at bench shapes.

Times each stage IN-JIT with fori_loop repetition (the axon tunnel adds
~24ms dispatch latency per call, which buries ms-scale stages measured
naively)."""
import time
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tuturenderer_tpu.camera import primary_ray
from tuturenderer_tpu.models.scenes import sphere_showcase
from tuturenderer_tpu.ops.intersect import intersect_core, occluded, shade_hit
from tuturenderer_tpu.ops.pallas.cluster import (
    ROWS, LANES, _visit_lists, _run_nearest, sorted_ray_order)
from tuturenderer_tpu.utils.vec import Vec3

SB = int(os.environ.get("PB_SB", "4"))      # samples batched
scene, cam = sphere_showcase(width=512, height=512)
cl = scene.clusters
n = cam.n_pixels * SB
print(f"lanes={n} clusters={cl.aabb.shape[0]}")

lane = jnp.arange(n, dtype=jnp.int32) % cam.n_pixels
px = lane % cam.width
py = lane // cam.width
o, d, _ = primary_ray(cam, px, py)
live = jnp.ones((n,), bool)


def timed(name, f, *a, reps=3):
    @jax.jit
    def many(*a):
        def body(i, acc):
            r = f(*a)
            leaves = [x for x in jax.tree.leaves(r)
                      if hasattr(x, 'dtype') and x.dtype.kind == 'f']
            return acc + leaves[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))
    jax.block_until_ready(many(*a))
    t0 = time.time()
    jax.block_until_ready(many(*a))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms ({n/dt/1e6:.1f} M lanes/s)")
    return dt


# stage 1: primary intersect (full pipeline incl sort + lists + kernel)
timed("intersect_core primary (sorted)", lambda o, d: intersect_core(
    scene, o, d, mask=live).t, o, d, reps=2)

# bounce-like rays
core = intersect_core(scene, o, d, mask=live)
hit = shade_hit(scene, o, d, core)
k = jax.random.PRNGKey(0)
rd = jax.random.normal(k, (3, n))
rn = jnp.sqrt((rd ** 2).sum(0))
d2 = Vec3(rd[0] / rn, rd[1] / rn, rd[2] / rn)
live2 = jax.block_until_ready(core.idx >= 0)
hp = Vec3(o.x + core.t * d.x, o.y + core.t * d.y, o.z + core.t * d.z)
hp = Vec3(jnp.where(live2, hp.x, -1e7), jnp.where(live2, hp.y, -1e7),
          jnp.where(live2, hp.z, -1e7))

timed("intersect_core bounce (sorted)", lambda o, d: intersect_core(
    scene, o, d, mask=live2).t, hp, d2, reps=2)

timed("morton sort only", lambda o, d: sorted_ray_order(cl, o, d)[0]
      .astype(jnp.float32), hp, d2)

perm, inv = jax.block_until_ready(jax.jit(
    lambda o, d: sorted_ray_order(cl, o, d))(hp, d2))
g = lambda v: Vec3(v.x[perm], v.y[perm], v.z[perm])
hps, d2s, lv2s = g(hp), g(d2), live2[perm]

timed("visit lists (sorted rays)", lambda o, d, lv: _visit_lists(
    cl.aabb, o.x, o.y, o.z, d.x, d.y, d.z, lv, None, ROWS)[1]
    .astype(jnp.float32), hps, d2s, lv2s)

timed("nearest kernel (sorted rays)", lambda o, d, lv: _run_nearest(
    cl.aabb, cl.tri_idx, cl.woop, o.x, o.y, o.z, d.x, d.y, d.z, lv,
    cluster_size=cl.cluster_size, rows=ROWS)[0], hps, d2s,
    live2[perm].astype(jnp.float32), reps=2)

# shadow rays toward the single light region (semi-coherent)
ldir = Vec3(-hp.x, 3.0 - hp.y, -hp.z)
ln = ldir.norm()
ldir = ldir * (1.0 / jnp.maximum(ln, 1e-9))
timed("occluded shadow (sorted)", lambda o, d, dist: occluded(
    scene, o, d, dist, mask=live2).astype(jnp.float32), hp, ldir, ln,
    reps=2)

# gather/shade stage
timed("shade_hit + gathers", lambda o, d: shade_hit(
    scene, o, d, core).t, o, d)
