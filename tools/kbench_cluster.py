"""Microbench variants of the cluster-nearest kernel on the real chip."""
import functools, time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tuturenderer_tpu.ops.pallas.cluster import (
    CGROUP, WOOP_F, _slab, _test, _tile_octants)
from tuturenderer_tpu.ops.pallas.intersect import F32_MAX, LANES, PARALLEL_EPS
from tuturenderer_tpu.models.scenes import sphere_showcase
from tuturenderer_tpu.camera import primary_ray
from tuturenderer_tpu.ops.pallas.cluster import sorted_ray_order

ROWS = 8

def make_kernel(mode, cluster_size):
    def kern(oct_ref, order_ref, aabb_ref, idx_ref, tri_ref,
             ox, oy, oz, dx, dy, dz, t_out, idx_out, bu_out, bv_out):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            t_out[...] = jnp.full(t_out.shape, F32_MAX)
            idx_out[...] = jnp.full(idx_out.shape, -1, jnp.int32)
            bu_out[...] = jnp.zeros(bu_out.shape)
            bv_out[...] = jnp.zeros(bv_out.shape)

        rox, roy, roz = ox[...], oy[...], oz[...]
        rdx, rdy, rdz = dx[...], dy[...], dz[...]

        if mode == "stream":          # no slab, no tris: pipeline floor
            return

        if mode == "slab":            # slab + reduction only, no branch body
            acc = jnp.zeros(t_out.shape, jnp.float32)
            for row in range(CGROUP):
                box = _slab(aabb_ref, row, rox, roy, roz, rdx, rdy, rdz,
                            t_out[...])
                acc = acc + box.astype(jnp.float32)
            bu_out[...] = acc
            return

        if mode == "always":          # triangle tests, no branch
            t_best = t_out[...]
            idx_best = idx_out[...]
            bu_best = bu_out[...]
            bv_best = bv_out[...]
            for row in range(CGROUP):
                for k in range(cluster_size):
                    t, u, v, dn = _test(tri_ref, row, k, rox, roy, roz,
                                        rdx, rdy, rdz)
                    ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                        (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                        (1.0 - u - v > 0.0) & (t < t_best)
                    t_best = jnp.where(ok, t, t_best)
                    idx_best = jnp.where(ok, idx_ref[row, k], idx_best)
                    bu_best = jnp.where(ok, u, bu_best)
                    bv_best = jnp.where(ok, v, bv_best)
            t_out[...] = t_best
            idx_out[...] = idx_best
            bu_out[...] = bu_best
            bv_out[...] = bv_best
            return

        if mode == "blockbranch":     # one branch per CGROUP block
            t_cur0 = t_out[...]
            anyrow = jnp.zeros((), jnp.bool_)
            boxes = []
            for row in range(CGROUP):
                b = _slab(aabb_ref, row, rox, roy, roz, rdx, rdy, rdz, t_cur0)
                boxes.append(b)
                anyrow = anyrow | jnp.any(b)

            @pl.when(anyrow)
            def _():
                t_best = t_out[...]
                idx_best = idx_out[...]
                bu_best = bu_out[...]
                bv_best = bv_out[...]
                for row in range(CGROUP):
                    for k in range(cluster_size):
                        t, u, v, dn = _test(tri_ref, row, k, rox, roy, roz,
                                            rdx, rdy, rdz)
                        ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                            (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                            (1.0 - u - v > 0.0) & (t < t_best)
                        t_best = jnp.where(ok, t, t_best)
                        idx_best = jnp.where(ok, idx_ref[row, k], idx_best)
                        bu_best = jnp.where(ok, u, bu_best)
                        bv_best = jnp.where(ok, v, bv_best)
                t_out[...] = t_best
                idx_out[...] = idx_best
                bu_out[...] = bu_best
                bv_out[...] = bv_best
            return

        # mode == "perrow": current production structure
        for row in range(CGROUP):
            t_cur = t_out[...]
            box = _slab(aabb_ref, row, rox, roy, roz, rdx, rdy, rdz, t_cur)

            @pl.when(jnp.any(box))
            def _(row=row, t_cur=t_cur):
                t_best = t_cur
                idx_best = idx_out[...]
                bu_best = bu_out[...]
                bv_best = bv_out[...]
                for k in range(cluster_size):
                    t, u, v, dn = _test(tri_ref, row, k, rox, roy, roz,
                                        rdx, rdy, rdz)
                    ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                        (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                        (1.0 - u - v > 0.0) & (t < t_best)
                    t_best = jnp.where(ok, t, t_best)
                    idx_best = jnp.where(ok, idx_ref[row, k], idx_best)
                    bu_best = jnp.where(ok, u, bu_best)
                    bv_best = jnp.where(ok, v, bv_best)
                t_out[...] = t_best
                idx_out[...] = idx_best
                bu_out[...] = bu_best
                bv_out[...] = bv_best
    return kern


@functools.partial(jax.jit, static_argnames=("cluster_size", "mode"))
def run(aabb, tri_idx, woop, order, ox, oy, oz, dx, dy, dz,
        cluster_size, mode):
    n = ox.shape[0]
    rows_total = n // LANES
    grid = (rows_total // ROWS, aabb.shape[0] // CGROUP)
    oct = _tile_octants(dx, dy, dz, rows_total, ROWS)
    cmap = lambda i, c, o_r, p_r: (p_r[o_r[i], c], 0)
    rmap = lambda i, c, o_r, p_r: (i, 0)
    ray_spec = lambda: pl.BlockSpec((ROWS, LANES), rmap,
                                    memory_space=pltpu.VMEM)
    aabb_spec = pl.BlockSpec((CGROUP, 8), cmap, memory_space=pltpu.SMEM)
    idx_spec = pl.BlockSpec((CGROUP, cluster_size), cmap,
                            memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec((CGROUP, cluster_size * WOOP_F), cmap,
                            memory_space=pltpu.SMEM)
    rs = lambda a: a.reshape(rows_total, LANES)
    out_shape = [
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        make_kernel(mode, cluster_size),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid,
            in_specs=[aabb_spec, idx_spec, tri_spec] +
                     [ray_spec() for _ in range(6)],
            out_specs=[ray_spec() for _ in range(4)],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(oct, order, aabb, tri_idx, woop,
      rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz))


def main():
    from tuturenderer_tpu.ops.pallas.cluster import build_clusters
    scene, cam = sphere_showcase(width=512, height=512)
    verts = np.stack([np.stack([np.asarray(v.x), np.asarray(v.y),
                                np.asarray(v.z)], axis=1)
                      for v in (scene.tv0, scene.tv1, scene.tv2)], axis=1)
    n = 512 * 512
    px = jnp.arange(n, dtype=jnp.int32) % 512
    py = jnp.arange(n, dtype=jnp.int32) // 512
    o, d, _ = primary_ray(cam, px, py)
    cache = {64: scene.clusters}
    modes = sys.argv[1:] or ["stream", "slab", "perrow", "blockbranch"]
    for spec in modes:
        parts = spec.split(':')
        mode = parts[0]
        csize = 64
        ident = False
        for p in parts[1:]:
            if p.startswith('cs'): csize = int(p[2:])
            if p == 'id': ident = True
        if csize not in cache:
            cache[csize] = build_clusters(verts, cluster_size=csize)
        cl = cache[csize]
        order = cl.order
        if ident:
            G = order.shape[1]
            order = jnp.tile(jnp.arange(G, dtype=jnp.int32), (8, 1))
        perm, inv = sorted_ray_order(cl, o, d)
        args = (cl.aabb, cl.tri_idx, cl.woop, order,
                o.x[perm], o.y[perm], o.z[perm],
                d.x[perm], d.y[perm], d.z[perm])
        cs = cl.woop.shape[1] // WOOP_F
        out = jax.block_until_ready(run(*args, cs, mode))
        ts = []
        for _ in range(5):
            t1 = time.time()
            jax.block_until_ready(run(*args, cs, mode))
            ts.append(time.time() - t1)
        hits = int((np.asarray(out[1]) >= 0).sum()) if mode != "stream" else -1
        print(f"{spec:16s} min={min(ts)*1000:7.1f}ms  med={sorted(ts)[2]*1000:7.1f}ms  hits={hits}")


if __name__ == "__main__":
    main()
