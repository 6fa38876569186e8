"""Sort-key layout experiment: how do direction-vs-origin bit budgets in
the octant-Morton ray key affect reachable-clusters/tile and actual
nearest-kernel time for REAL bounce wavefronts (cosine-hemisphere around
surface normals, not uniform random dirs)?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tuturenderer_tpu.camera import primary_ray
from tuturenderer_tpu.models.scenes import sphere_showcase
from tuturenderer_tpu.ops.intersect import intersect_core, shade_hit
from tuturenderer_tpu.ops.pallas.cluster import (
    LANES, ROWS, _part1by2, _run_nearest, _visit_lists)
from tuturenderer_tpu.utils.vec import Vec3, local_to_world

SB = int(os.environ.get("PK_SB", "8"))
scene, cam = sphere_showcase(width=512, height=512)
cl = scene.clusters
n = cam.n_pixels * SB
lane = jnp.arange(n, dtype=jnp.int32) % cam.n_pixels
px = lane % cam.width
py = lane // cam.width
o, d, _ = primary_ray(cam, px, py)
live = jnp.ones((n,), bool)

# build a REAL bounce-1 wavefront: cosine-hemisphere around shading normal
core = intersect_core(scene, o, d, mask=live)
hit = shade_hit(scene, o, d, core)
k = jax.random.PRNGKey(0)
r0 = jax.random.uniform(jax.random.fold_in(k, 0), (n,))
r1 = jax.random.uniform(jax.random.fold_in(k, 1), (n,))
ct = jnp.sqrt(1.0 - r0)
st = jnp.sqrt(r0)
phi = 2.0 * jnp.pi * r1
local = Vec3(st * jnp.cos(phi), st * jnp.sin(phi), ct)
d2 = local_to_world(local, hit.ns)
live2 = np.asarray(core.idx >= 0)
hp = Vec3(o.x + core.t * d.x, o.y + core.t * d.y, o.z + core.t * d.z)
hp = Vec3(jnp.where(live2, hp.x, -1e7), jnp.where(live2, hp.y, -1e7),
          jnp.where(live2, hp.z, -1e7))
d2 = Vec3(jnp.where(live2, d2.x, 0.0), jnp.where(live2, d2.y, -1.0),
          jnp.where(live2, d2.z, 0.0))
live2 = jnp.asarray(live2)
print(f"lanes={n} live={float(jnp.mean(live2.astype(jnp.float32))):.3f} "
      f"clusters={cl.aabb.shape[0]}")


def make_key(orig, dd, dir_hi_bits, origin_bits):
    """octant(3) | dir-morton(dir_hi_bits) | origin-morton(origin_bits*3)
    | dir refinement fills the rest."""
    ext = jnp.maximum(cl.scene_hi - cl.scene_lo, 1e-20)
    q = lambda ov, kk, s: jnp.clip(((ov - cl.scene_lo[kk]) / ext[kk] * s)
                                   .astype(jnp.int32), 0, int(s) - 1)
    octant = ((dd.x < 0).astype(jnp.int32) + 2 * (dd.y < 0).astype(jnp.int32)
              + 4 * (dd.z < 0).astype(jnp.int32))
    ob = origin_bits
    mo = (_part1by2(q(orig.x, 0, float(1 << ob)), ob) |
          (_part1by2(q(orig.y, 1, float(1 << ob)), ob) << 1) |
          (_part1by2(q(orig.z, 2, float(1 << ob)), ob) << 2))
    # direction morton over |dx|,|dy| within octant
    db = (dir_hi_bits + 1) // 2
    qd = lambda c: jnp.clip(jnp.abs(c) * (1 << db), 0.0,
                            float((1 << db) - 1)).astype(jnp.int32)
    dx_, dy_ = qd(dd.x), qd(dd.y)
    md = jnp.zeros_like(dx_)
    for b in range(db):
        md = md | (((dx_ >> b) & 1) << (2 * b)) | (((dy_ >> b) & 1) << (2 * b + 1))
    hi_dir = md >> max(0, 2 * db - dir_hi_bits)
    key = octant
    key = (key << dir_hi_bits) | hi_dir
    key = (key << (3 * ob)) | mo
    return key


def measure(name, keyfn):
    keys = keyfn(hp, d2)
    keys = jnp.where(live2, keys, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(keys)
    g = lambda v: Vec3(v.x[order], v.y[order], v.z[order])
    hs, ds, ls = g(hp), g(d2), live2[order]
    vl, ve = jax.jit(lambda a, b, lv: _visit_lists(
        cl.aabb, a.x, a.y, a.z, b.x, b.y, b.z, lv, None, ROWS))(hs, ds, ls)
    ve = np.asarray(ve).reshape(n // (ROWS * LANES), -1)
    reach = (ve < 3.0e37).sum(1)

    run = jax.jit(lambda a, b, lv: _run_nearest(
        cl.aabb, cl.tri_idx, cl.woop, a.x, a.y, a.z, b.x, b.y, b.z, lv,
        cluster_size=cl.cluster_size, rows=ROWS)[0])
    lsf = ls.astype(jnp.float32)
    out = run(hs, ds, lsf)
    np.asarray(out[:1])
    t0 = time.time()
    for _ in range(2):
        np.asarray(run(hs, ds, lsf)[:1])
    dt = (time.time() - t0) / 2
    print(f"{name}: reach mean {reach.mean():6.0f} p95 "
          f"{np.percentile(reach, 95):6.0f} | kernel {dt*1000:7.1f} ms")


measure("current (oct|o6x3|d10 low)",
        lambda a, b: make_key(a, b, 0, 6))
measure("oct|d2|o6x3", lambda a, b: make_key(a, b, 2, 6))
measure("oct|d4|o6x3", lambda a, b: make_key(a, b, 4, 6))
measure("oct|d6|o5x3", lambda a, b: make_key(a, b, 6, 5))
measure("oct|d4|o5x3", lambda a, b: make_key(a, b, 4, 5))
measure("oct|d8|o4x3", lambda a, b: make_key(a, b, 8, 4))
