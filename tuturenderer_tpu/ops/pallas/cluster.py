"""Streaming cluster-culling intersection for large scenes (Pallas TPU).

The reference accelerates large meshes with a pointer-chasing BVH
(BVH.hpp:145-194). Per-ray stack traversal is the wrong shape for a
vector machine: every lane waits for the slowest stack, and the node
gathers hit HBM. The TPU-native re-design used here:

- host groups triangles into fixed-size CLUSTERS (median split on the
  longest centroid axis — the same heuristic as the reference BVH build,
  BVH.hpp:69-120 — cut when <= CLUSTER_SIZE remain), each with an AABB;
- the kernel runs on a (ray_tile, cluster) grid. Pallas pipelines the
  per-cluster triangle block into VMEM/SMEM automatically (double
  buffering), so the whole scene streams past each resident ray tile at
  HBM bandwidth — no gathers, no stacks;
- per grid step, the tile slab-tests the cluster AABB against every
  lane's current best t; if NO lane can hit the cluster, the 64 woop
  triangle tests are skipped via a scalar @pl.when branch (tile-coherent
  culling — the vector analogue of the reference's early-out, which its
  own traversal lacks, BVH.hpp:160-166);
- nearest-hit state (t/idx/u/v) lives in the output blocks, which stay
  resident across the cluster dimension of the grid (accumulator
  pattern).

Same acceptance rules as ops/intersect.py / Triangle.hpp:39-49.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import F32_MAX, LANES, PARALLEL_EPS

CLUSTER_SIZE = 64
ROWS = 8                 # rays per tile = ROWS x LANES = 1024; the f32
                         # sublane minimum — the tightest tile the TPU
                         # allows, maximizing any-lane cull effectiveness
CGROUP = 8               # clusters fetched per SMEM block (TPU tiling:
                         # sublane dim of a block must be divisible by 8)


WOOP_F = 14              # floats per packed triangle row: 12 inverse-basis
                         # values + |n| + material alpha (transmittance)


class Clusters(NamedTuple):
    """Host-built cluster tables (device arrays). The cluster count is
    padded to a multiple of CGROUP; padded clusters have inverted AABBs
    (min=+inf, max=-inf) so no ray ever enters them."""
    aabb: jnp.ndarray      # [C, 8] f32: min(3), max(3), 2 pad
    woop: jnp.ndarray      # [C, CLUSTER_SIZE*WOOP_F] f32 per-triangle rows
    tri_idx: jnp.ndarray   # [C, CLUSTER_SIZE] i32 original ids, -1 pad
    scene_lo: jnp.ndarray  # [3] f32 scene bound (ray-sort quantization)
    scene_hi: jnp.ndarray  # [3] f32
    order: jnp.ndarray     # [8, C/CGROUP] i32 per-direction-octant
                           # front-to-back visit order of CGROUP blocks

    @property
    def n_clusters(self) -> int:
        return self.aabb.shape[0]


def woop_rows(verts: np.ndarray):
    """Per-triangle inverse-basis rows (float64 factorization on host).
    Returns (rows [T,3,3], c [T,3], nlen [T]) with rows zeroed for
    degenerate triangles (their tests then always reject)."""
    v0 = verts[:, 0].astype(np.float64)
    e1 = verts[:, 1].astype(np.float64) - v0
    e2 = verts[:, 2].astype(np.float64) - v0
    n = np.cross(e1, e2)
    basis = np.stack([e1, e2, n], axis=2)
    det = np.linalg.det(basis)
    ok = np.abs(det) > 1e-30
    safe = basis.copy()
    safe[~ok] = np.eye(3)
    rows = np.linalg.inv(safe)
    rows[~ok] = 0.0
    c = np.einsum('tij,tj->ti', rows, v0)
    c[~ok] = 0.0
    return rows, c, np.linalg.norm(n, axis=1)


def pack_woop(rows: np.ndarray, c: np.ndarray, nlen: np.ndarray,
              alpha: np.ndarray):
    """[T, WOOP_F] layout r1(3) c1 r2(3) c2 r3(3) c3 nlen alpha."""
    t = rows.shape[0]
    p = np.concatenate([rows, c[:, :, None]], axis=2).reshape(t, 12)
    return np.concatenate([p, nlen[:, None], alpha[:, None]],
                          axis=1).astype(np.float32)


def build_clusters(verts: np.ndarray, cluster_size: int = CLUSTER_SIZE,
                   alphas: np.ndarray = None) -> Clusters:
    """Median-split grouping of triangles into padded fixed-size clusters.
    ``alphas``: per-triangle material opacity for the transmittance kernel
    (defaults to fully opaque)."""
    t = verts.shape[0]
    if alphas is None:
        alphas = np.ones((t,), np.float32)
    lo = verts.min(axis=1)
    hi = verts.max(axis=1)
    centroid = 0.5 * (lo + hi)

    groups = []
    stack = [np.arange(t)]
    while stack:
        idx = stack.pop()
        if len(idx) <= cluster_size:
            groups.append(idx)
            continue
        bmin = lo[idx].min(axis=0)
        bmax = hi[idx].max(axis=0)
        axis = int(np.argmax(bmax - bmin))
        srt = idx[np.argsort(centroid[idx, axis], kind="stable")]
        mid = len(srt) // 2
        stack.append(srt[mid:])
        stack.append(srt[:mid])

    cnum = -(-len(groups) // CGROUP) * CGROUP
    rows, cvec, nlen = woop_rows(verts)
    w = pack_woop(rows, cvec, nlen, np.asarray(alphas, np.float32))

    aabb = np.zeros((cnum, 8), np.float32)
    aabb[:, :3] = np.float32(3.4e38)       # padded clusters: empty boxes
    aabb[:, 3:6] = np.float32(-3.4e38)
    woop = np.zeros((cnum, cluster_size * WOOP_F), np.float32)
    tri_idx = np.full((cnum, cluster_size), -1, np.int32)
    for ci, idx in enumerate(groups):
        aabb[ci, :3] = lo[idx].min(axis=0)
        aabb[ci, 3:6] = hi[idx].max(axis=0)
        woop[ci, :len(idx) * WOOP_F] = w[idx].reshape(-1)
        tri_idx[ci, :len(idx)] = idx

    # Per-direction-octant front-to-back visit order of the CGROUP blocks.
    # For every ray whose direction signs match octant o, sorting blocks by
    # the signed projection of their centroid visits them near-to-far
    # (exact for parallel rays, a strong heuristic otherwise) — the ordered
    # early-out the reference BVH never had (BVH.hpp:160-166): each lane's
    # best-t shrinks early, so the slab cull's `tmin < t_lim` test rejects
    # the far clusters wholesale.
    ngroup = cnum // CGROUP
    center = 0.5 * (aabb[:, :3] + aabb[:, 3:6])        # nan/huge for pads
    valid = tri_idx[:, 0] >= 0
    center[~valid] = 0.0
    gvalid = valid.reshape(ngroup, CGROUP).any(axis=1)
    gcount = np.maximum(valid.reshape(ngroup, CGROUP).sum(axis=1), 1)
    gcenter = (center.reshape(ngroup, CGROUP, 3).sum(axis=1)
               / gcount[:, None])
    order = np.zeros((8, ngroup), np.int32)
    for o in range(8):
        s = np.array([(-1.0 if o & (1 << a) else 1.0) for a in range(3)],
                     np.float32)
        key = gcenter @ s
        key[~gvalid] = np.float32(3.0e38)              # empty blocks last
        order[o] = np.argsort(key, kind="stable").astype(np.int32)

    return Clusters(aabb=jnp.asarray(aabb), woop=jnp.asarray(woop),
                    tri_idx=jnp.asarray(tri_idx),
                    scene_lo=jnp.asarray(lo.min(axis=0).astype(np.float32)),
                    scene_hi=jnp.asarray(hi.max(axis=0).astype(np.float32)),
                    order=jnp.asarray(order))


def _beam_bits(aabb, ox, oy, oz, dx, dy, dz, live, dist, rows):
    """Per-(ray_tile, cluster) conservative reachability bits, computed in
    plain XLA *outside* the kernel.

    Why: the original kernel branched on an in-kernel `jnp.any(slab)`
    reduction; each vector->scalar sync costs ~1.5us on the VPU/scalar
    boundary, and with (tiles x clusters x CGROUP) branches that sync —
    not the triangle tests — dominated the whole intersection (measured:
    an all-culled scene ran as slow as a no-cull one). Here each tile is
    reduced to an interval beam (origin box x direction box) once, the
    beam/cluster slab test runs vectorized over all pairs, and the kernel
    branches on a *scalar* bit streamed through SMEM — no syncs.

    The interval arithmetic is outward-conservative: a cluster any live
    lane could hit within ``dist`` always gets bit 1 (over-acceptance
    only costs speed, never correctness). Dead/padded lanes are excluded
    via ``live`` so they never widen a beam.

    Returns int32 [n_tiles, C].
    """
    n = ox.shape[0]
    nt = n // (rows * LANES)
    big = jnp.float32(3.0e38)
    rs = lambda a: a.reshape(nt, rows * LANES)
    lv = rs(live)
    mn = lambda a: jnp.min(jnp.where(lv, rs(a), big), axis=1)
    mx = lambda a: jnp.max(jnp.where(lv, rs(a), -big), axis=1)
    ol = jnp.stack([mn(ox), mn(oy), mn(oz)], 1)[:, None, :]   # [nt,1,3]
    oh = jnp.stack([mx(ox), mx(oy), mx(oz)], 1)[:, None, :]
    dl = jnp.stack([mn(dx), mn(dy), mn(dz)], 1)[:, None, :]
    dh = jnp.stack([mx(dx), mx(dy), mx(dz)], 1)[:, None, :]
    tmax = mx(dist) if dist is not None else jnp.full((nt,), big)
    bl = aabb[None, :, :3]                                    # [1,C,3]
    bh = aabb[None, :, 3:6]

    eps = jnp.float32(1e-12)
    overlap = (oh >= bl) & (ol <= bh)
    below = oh < bl
    above = ol > bh
    reach = overlap | (below & (dh > 0.0)) | (above & (dl < 0.0))
    enter_b = (bl - oh) / jnp.maximum(dh, eps)
    enter_a = (bh - ol) / jnp.minimum(dl, -eps)
    enter = jnp.where(overlap, 0.0, jnp.where(below, enter_b, enter_a))
    exit_p = (bh - ol) / jnp.maximum(dl, eps)
    exit_n = (bl - oh) / jnp.minimum(dh, -eps)
    exitt = jnp.where(dl > 0.0, exit_p,
                      jnp.where(dh < 0.0, exit_n, big))
    # outward float-safety margin so interval rounding can't drop a
    # cluster a per-lane test would accept
    enter = enter * (1.0 - 1e-5) - 1e-4
    exitt = exitt * (1.0 + 1e-5) + 1e-4
    t_in = jnp.max(enter, axis=2)
    t_out = jnp.min(exitt, axis=2)
    ok = jnp.all(reach, axis=2) & (t_in <= t_out) & \
        (t_in <= tmax[:, None])
    return ok.astype(jnp.int32)


def _pack_bits(ok):
    """[n_tiles, C] 0/1 -> [n_tiles, ceil(C/32)] i32 with bit j%32 of
    word j//32 carrying cluster j's reachability. Packed so the whole
    table rides as a scalar-prefetch SMEM array (SMEM caps out near
    256 KiB; one bit per (tile, cluster) keeps even 1M-lane x 8k-cluster
    scenes at 32 KiB/tile-row). Kernels read one scalar word and test a
    bit — no vector->scalar sync, no blocked-BlockSpec tiling rules."""
    nt, c = ok.shape
    c32 = -(-c // 32) * 32
    if c32 != c:
        ok = jnp.pad(ok, ((0, 0), (0, c32 - c)))
    w = ok.reshape(nt, c32 // 32, 32).astype(jnp.uint32)
    w = jnp.sum(w << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
                axis=2, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(w, jnp.int32)


def _bit_at(bits_ref, i, j):
    """Scalar read of packed bit j from tile i's row of _pack_bits output."""
    word = bits_ref[i, jax.lax.shift_right_logical(j, 5)]
    return jnp.bitwise_and(
        jax.lax.shift_right_logical(word, jnp.bitwise_and(j, 31)), 1)


def _woop13(tri_ref, row, k):
    base = k * WOOP_F
    return [tri_ref[row, base + j] for j in range(13)]


def _woop_alpha(tri_ref, row, k):
    return tri_ref[row, k * WOOP_F + 13]


def _test(tri_ref, row, k, rox, roy, roz, rdx, rdy, rdz):
    (r1x, r1y, r1z, c1, r2x, r2y, r2z, c2,
     r3x, r3y, r3z, c3, nlen) = _woop13(tri_ref, row, k)
    w_o = rox * r3x + roy * r3y + roz * r3z - c3
    w_d = rdx * r3x + rdy * r3y + rdz * r3z
    inv = 1.0 / w_d
    t = -w_o * inv
    u = (rox * r1x + roy * r1y + roz * r1z - c1) + \
        t * (rdx * r1x + rdy * r1y + rdz * r1z)
    v = (rox * r2x + roy * r2y + roz * r2z - c2) + \
        t * (rdx * r2x + rdy * r2y + rdz * r2z)
    dn = w_d * nlen
    return t, u, v, dn


def _slab(aabb_ref, row, rox, roy, roz, rdx, rdy, rdz, t_lim):
    """AABB slab test of the whole ray tile vs one box; conservative on
    axis-parallel rays (inv clamped, BoundBox.hpp:55-92 accept rule)."""
    inv = lambda c: 1.0 / jnp.where(c == 0.0, 1e-30, c)
    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)
    t0x = (aabb_ref[row, 0] - rox) * ix
    t1x = (aabb_ref[row, 3] - rox) * ix
    t0y = (aabb_ref[row, 1] - roy) * iy
    t1y = (aabb_ref[row, 4] - roy) * iy
    t0z = (aabb_ref[row, 2] - roz) * iz
    t1z = (aabb_ref[row, 5] - roz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tmin <= tmax) & (tmax >= 0.0) & (tmin < t_lim)


def _kernel_nearest(oct_ref, order_ref, bits_ref, idx_ref, tri_ref,
                    ox, oy, oz, dx, dy, dz,
                    t_out, idx_out, bu_out, bv_out, *, cluster_size: int):
    # oct_ref/order_ref are scalar-prefetch args consumed by the BlockSpec
    # index maps (octant-ordered cluster streaming). bits_ref is the
    # packed beam-cull bit table (_pack_bits): the branch below reads one
    # scalar word from SMEM — no in-kernel vector->scalar reduction
    # (see _beam_bits).
    i = pl.program_id(0)
    c = pl.program_id(1)
    blk = order_ref[oct_ref[i], c]

    @pl.when(c == 0)
    def _():
        t_out[...] = jnp.full(t_out.shape, F32_MAX)
        idx_out[...] = jnp.full(idx_out.shape, -1, jnp.int32)
        bu_out[...] = jnp.zeros(bu_out.shape)
        bv_out[...] = jnp.zeros(bv_out.shape)

    rox = ox[...]
    roy = oy[...]
    roz = oz[...]
    rdx = dx[...]
    rdy = dy[...]
    rdz = dz[...]

    for row in range(CGROUP):
        @pl.when(_bit_at(bits_ref, i, blk * CGROUP + row) != 0)
        def _(row=row):
            t_best = t_out[...]
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


def _kernel_anyhit(oct_ref, order_ref, bits_ref, idx_ref, tri_ref,
                   ox, oy, oz, dx, dy, dz,
                   dist, hit_out, *, cluster_size: int):
    i = pl.program_id(0)
    c = pl.program_id(1)
    blk = order_ref[oct_ref[i], c]

    @pl.when(c == 0)
    def _():
        hit_out[...] = jnp.zeros(hit_out.shape, jnp.int32)

    rox = ox[...]
    roy = oy[...]
    roz = oz[...]
    rdx = dx[...]
    rdy = dy[...]
    rdz = dz[...]
    rdist = dist[...]

    for row in range(CGROUP):
        @pl.when(_bit_at(bits_ref, i, blk * CGROUP + row) != 0)
        def _(row=row):
            blocked = hit_out[...]
            for k in range(cluster_size):
                t, u, v, dn = _test(tri_ref, row, k, rox, roy, roz,
                                    rdx, rdy, rdz)
                ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                    (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                    (1.0 - u - v > 0.0) & \
                    (t < rdist) & (jnp.abs(t - rdist) >= PARALLEL_EPS)
                blocked = blocked | ok.astype(jnp.int32)
            hit_out[...] = blocked


def _tile_octants(dx, dy, dz, rows_total, rows):
    """Direction octant id per ray tile (sign of the per-tile mean).
    Dead lanes carry d=(0,-1,0) (see intersect._mask_rays) so all-dead
    tiles land in a fixed octant; mixed tiles follow the majority."""
    n_tiles = rows_total // rows
    red = lambda a: a.reshape(n_tiles, rows * LANES).sum(axis=1)
    sx, sy, sz = red(dx), red(dy), red(dz)
    return ((sx < 0).astype(jnp.int32) + 2 * (sy < 0).astype(jnp.int32)
            + 4 * (sz < 0).astype(jnp.int32))


def _cluster_specs(rows, cluster_size):
    """BlockSpecs for the octant-ordered (ray_tile, cluster_block) grid.
    The first three pallas args are scalar-prefetch: tile octants
    [n_tiles], the per-octant block visit order [8, G], and the packed
    beam-cull bit table [n_tiles, ceil(C/32)] (_pack_bits); the
    cluster-table index maps dereference the first two so tile i streams
    blocks front-to-back for its own direction octant, and the kernel
    body tests bits straight out of SMEM."""
    cmap = lambda i, c, oct_r, ord_r, bits_r: (ord_r[oct_r[i], c], 0)
    rmap = lambda i, c, oct_r, ord_r, bits_r: (i, 0)
    ray_spec = lambda: pl.BlockSpec((rows, LANES), rmap,
                                    memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((CGROUP, cluster_size), cmap,
                            memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec((CGROUP, cluster_size * WOOP_F), cmap,
                            memory_space=pltpu.SMEM)
    return ray_spec, idx_spec, tri_spec


@functools.partial(jax.jit,
                   static_argnames=("cluster_size", "rows", "interpret"))
def _run_nearest(aabb, tri_idx, woop, order, ox, oy, oz, dx, dy, dz, live,
                 cluster_size: int, rows: int, interpret: bool = False):
    n = ox.shape[0]
    rows_total = n // LANES
    grid = (rows_total // rows, aabb.shape[0] // CGROUP)
    oct = _tile_octants(dx, dy, dz, rows_total, rows)
    bits = _pack_bits(_beam_bits(aabb, ox, oy, oz, dx, dy, dz, live,
                                 None, rows))

    ray_spec, idx_spec, tri_spec = _cluster_specs(rows, cluster_size)
    rs = lambda a: a.reshape(rows_total, LANES)
    out_shape = [
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
    ]
    kernel = functools.partial(_kernel_nearest, cluster_size=cluster_size)
    t, idx, bu, bv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[idx_spec, tri_spec] +
                     [ray_spec() for _ in range(6)],
            out_specs=[ray_spec() for _ in range(4)],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(oct, order, bits, tri_idx, woop,
      rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz))
    flat = lambda a: a.reshape(-1)
    return flat(t), flat(idx), flat(bu), flat(bv)


@functools.partial(jax.jit,
                   static_argnames=("cluster_size", "rows", "interpret"))
def _run_anyhit(aabb, tri_idx, woop, order, ox, oy, oz, dx, dy, dz, dist,
                live, cluster_size: int, rows: int,
                interpret: bool = False):
    n = ox.shape[0]
    rows_total = n // LANES
    grid = (rows_total // rows, aabb.shape[0] // CGROUP)
    oct = _tile_octants(dx, dy, dz, rows_total, rows)
    bits = _pack_bits(_beam_bits(aabb, ox, oy, oz, dx, dy, dz, live,
                                 dist, rows))

    ray_spec, idx_spec, tri_spec = _cluster_specs(rows, cluster_size)
    rs = lambda a: a.reshape(rows_total, LANES)
    kernel = functools.partial(_kernel_anyhit, cluster_size=cluster_size)
    hit = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[idx_spec, tri_spec] +
                     [ray_spec() for _ in range(7)],
            out_specs=ray_spec(),
        ),
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(oct, order, bits, tri_idx, woop,
      rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz), rs(dist))
    return hit.reshape(-1)


def _kernel_transmit(bits_ref, idx_ref, tri_ref, ox, oy, oz, dx, dy, dz,
                     dist, trans_out, *, cluster_size: int):
    """Alpha-weighted shadow transmittance: product of (1 - alpha) over
    every triangle crossed within dist (getShadowCoeffi semantics,
    BVHStrategy.hpp:13-45). Same accept rule as the any-hit kernel.
    bits_ref is the packed scalar-prefetch cull table (_pack_bits);
    blocks stream in natural order (no octant sort: every triangle
    within dist contributes, so there is no early-out to order for)."""
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        trans_out[...] = jnp.ones(trans_out.shape, jnp.float32)

    rox = ox[...]
    roy = oy[...]
    roz = oz[...]
    rdx = dx[...]
    rdy = dy[...]
    rdz = dz[...]
    rdist = dist[...]

    for row in range(CGROUP):
        @pl.when(_bit_at(bits_ref, i, c * CGROUP + row) != 0)
        def _(row=row):
            trans = trans_out[...]
            for k in range(cluster_size):
                t, u, v, dn = _test(tri_ref, row, k, rox, roy, roz,
                                    rdx, rdy, rdz)
                ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                    (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                    (1.0 - u - v > 0.0) & (t < rdist)
                a = _woop_alpha(tri_ref, row, k)
                trans = trans * jnp.where(ok, 1.0 - a, 1.0)
            trans_out[...] = trans


@functools.partial(jax.jit,
                   static_argnames=("cluster_size", "rows", "interpret"))
def _run_transmit(aabb, tri_idx, woop, ox, oy, oz, dx, dy, dz, dist, live,
                  cluster_size: int, rows: int, interpret: bool = False):
    n = ox.shape[0]
    rows_total = n // LANES
    grid = (rows_total // rows, aabb.shape[0] // CGROUP)
    bits = _pack_bits(_beam_bits(aabb, ox, oy, oz, dx, dy, dz, live,
                                 dist, rows))

    ray_spec = lambda: pl.BlockSpec((rows, LANES),
                                    lambda i, c, bits_r: (i, 0),
                                    memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((CGROUP, cluster_size),
                            lambda i, c, bits_r: (c, 0),
                            memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec((CGROUP, cluster_size * WOOP_F),
                            lambda i, c, bits_r: (c, 0),
                            memory_space=pltpu.SMEM)
    rs = lambda a: a.reshape(rows_total, LANES)
    kernel = functools.partial(_kernel_transmit, cluster_size=cluster_size)
    trans = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[idx_spec, tri_spec] +
                     [ray_spec() for _ in range(7)],
            out_specs=ray_spec(),
        ),
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(bits, tri_idx, woop, rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz),
      rs(dist))
    return trans.reshape(-1)


def _live_mask(live, orig, n):
    """Default live mask: everything live, except the degenerate
    dead-lane encoding from intersect._mask_rays (origin -1e7)."""
    if live is not None:
        return live
    return orig.x > jnp.float32(-9.9e6)


def cluster_transmittance(clusters: Clusters, orig, d, dist,
                          rows: int = ROWS, sort: bool = False,
                          interpret: bool = False, live=None):
    """Product of (1 - alpha) over crossed triangles within dist -> [N]."""
    n = orig.x.shape[0]
    live = _live_mask(live, orig, n)
    if sort:
        from ...utils.vec import Vec3
        perm, inv = sorted_ray_order(clusters, orig, d)
        g = lambda v: Vec3(v.x[perm], v.y[perm], v.z[perm])
        tr = cluster_transmittance(clusters, g(orig), g(d), dist[perm],
                                   rows=rows, interpret=interpret,
                                   live=live[perm])
        return tr[inv]
    block = rows * LANES
    n_pad = -(-n // block) * block
    p = lambda a: _pad(a, n_pad, n)
    cs = clusters.woop.shape[1] // WOOP_F
    tr = _run_transmit(
        clusters.aabb, clusters.tri_idx, clusters.woop,
        p(orig.x), p(orig.y), p(orig.z), p(d.x), p(d.y), p(d.z), p(dist),
        p(live), cluster_size=cs, rows=rows, interpret=interpret)
    if n_pad != n:
        tr = tr[:n]
    return tr


def _part1by2(x, bits=8):
    """Spread the low ``bits`` bits of x so consecutive bits land 3 apart."""
    x = x & ((1 << bits) - 1)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_keys(clusters: Clusters, orig, d):
    """Sort key (30-bit int32): Morton of the quantized origin (6 bits per
    axis, high) then Morton of the quantized direction (4 bits per axis,
    low). Sorting a bounce wavefront by this key makes ray tiles
    spatially AND directionally tight, which is what the tile-level
    cluster culling feeds on (incoherent tiles cull nothing).

    The direction bits are essential for PRIMARY rays: all camera rays
    share one origin, so an origin-only key leaves them in row-major
    order — 128-lane tiles become full-width image strips whose beam
    crosses most of the scene and culls nothing. Direction-Morton
    ordering groups them into compact screen blocks instead."""
    ext = jnp.maximum(clusters.scene_hi - clusters.scene_lo, 1e-20)
    q = lambda o, k, s: jnp.clip(((o - clusters.scene_lo[k]) / ext[k] * s)
                                 .astype(jnp.int32), 0, int(s) - 1)
    mo = (_part1by2(q(orig.x, 0, 64.0), 6) |
          (_part1by2(q(orig.y, 1, 64.0), 6) << 1) |
          (_part1by2(q(orig.z, 2, 64.0), 6) << 2))
    qd = lambda c: jnp.clip(((c + 1.0) * 8.0).astype(jnp.int32), 0, 15)
    md = (_part1by2(qd(d.x), 4) | (_part1by2(qd(d.y), 4) << 1) |
          (_part1by2(qd(d.z), 4) << 2))
    return (mo << 12) | md


def sorted_ray_order(clusters: Clusters, orig, d):
    """(perm, inv_perm) sorting rays by octant-Morton key."""
    keys = ray_sort_keys(clusters, orig, d)
    perm = jnp.argsort(keys)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return perm, inv


def _pad(a, n_pad, n):
    return jnp.pad(a, (0, n_pad - n)) if n_pad != n else a


def cluster_intersect(clusters: Clusters, orig, d, rows: int = ROWS,
                      sort: bool = False, interpret: bool = False,
                      live=None):
    """Nearest triangle hit -> (t, idx, bu, bv) flat [N] (idx = -1 miss).
    ``sort=True`` reorders the wavefront by octant-Morton key first
    (worth it for incoherent bounce rays; camera rays are already
    pixel-ordered). ``live`` (bool [N], optional): lanes to consider for
    the beam-cull bits; defaults to the dead-lane origin encoding."""
    n = orig.x.shape[0]
    live = _live_mask(live, orig, n)
    if sort:
        from ...utils.vec import Vec3
        perm, inv = sorted_ray_order(clusters, orig, d)
        g = lambda v: Vec3(v.x[perm], v.y[perm], v.z[perm])
        t, idx, bu, bv = cluster_intersect(clusters, g(orig), g(d),
                                           rows=rows, interpret=interpret,
                                           live=live[perm])
        return t[inv], idx[inv], bu[inv], bv[inv]
    block = rows * LANES
    n_pad = -(-n // block) * block
    p = lambda a: _pad(a, n_pad, n)
    cs = clusters.woop.shape[1] // WOOP_F
    t, idx, bu, bv = _run_nearest(
        clusters.aabb, clusters.tri_idx, clusters.woop, clusters.order,
        p(orig.x), p(orig.y), p(orig.z), p(d.x), p(d.y), p(d.z), p(live),
        cluster_size=cs, rows=rows, interpret=interpret)
    if n_pad != n:
        t, idx, bu, bv = t[:n], idx[:n], bu[:n], bv[:n]
    return t, idx, bu, bv


def cluster_occluded(clusters: Clusters, orig, d, dist, rows: int = ROWS,
                     sort: bool = False, interpret: bool = False,
                     live=None):
    """Any-hit within dist (endpoint epsilon guard) -> bool [N]."""
    n = orig.x.shape[0]
    live = _live_mask(live, orig, n)
    if sort:
        from ...utils.vec import Vec3
        perm, inv = sorted_ray_order(clusters, orig, d)
        g = lambda v: Vec3(v.x[perm], v.y[perm], v.z[perm])
        hit = cluster_occluded(clusters, g(orig), g(d), dist[perm],
                               rows=rows, interpret=interpret,
                               live=live[perm])
        return hit[inv]
    block = rows * LANES
    n_pad = -(-n // block) * block
    p = lambda a: _pad(a, n_pad, n)
    cs = clusters.woop.shape[1] // WOOP_F
    hit = _run_anyhit(
        clusters.aabb, clusters.tri_idx, clusters.woop, clusters.order,
        p(orig.x), p(orig.y), p(orig.z), p(d.x), p(d.y), p(d.z), p(dist),
        p(live), cluster_size=cs, rows=rows, interpret=interpret)
    if n_pad != n:
        hit = hit[:n]
    return hit.astype(bool)
