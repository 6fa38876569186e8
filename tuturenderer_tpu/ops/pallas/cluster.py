"""Visit-list cluster traversal for large scenes (Pallas TPU).

The reference accelerates large meshes with a pointer-chasing BVH
(BVH.hpp:145-194). Per-ray stack traversal is the wrong shape for a
vector machine, and the round-2 design — a (ray_tile, cluster_block)
grid streaming EVERY block past every tile with a packed cull-bit test —
still paid one grid step + one SMEM DMA per (tile, block) pair even when
the bit said "skip" (measured: culled steps cost ~3us each, making a
100k-triangle scene only as fast as the reference's 20-thread CPU).

The round-3 re-design eliminates that overhead class entirely:

- host groups triangles into fixed-size CLUSTERS (median split on the
  longest centroid axis, the reference BVH heuristic, BVH.hpp:69-120),
  each with an AABB; each cluster's Woop-basis triangle rows are packed
  into ONE native (8,128) f32 tile so a single DMA fetches a cluster;
- per launch, plain XLA reduces each 1024-ray tile to an interval beam
  (origin box x direction box over LIVE lanes), slab-tests it against
  every cluster AABB, and emits a per-tile VISIT LIST: cluster ids
  sorted by conservative beam entry distance, unreachable clusters
  pushed to the tail with +inf sentinel entries;
- the kernel runs on grid=(n_tiles,): each tile walks its own list with
  a dynamic lax.while_loop, double-buffering cluster tiles HBM->SMEM
  with manual DMA. The loop EXITS (not skips) at the first entry >=
  t_lim, where t_lim is the max best-t over live lanes, re-reduced
  after every group of G clusters — ordered early-out termination, the
  thing the reference BVH never had (BVH.hpp:160-166). Unreachable and
  past-the-end positions are the same case: sentinel entries.

Cost model (measured on v5e): ~880ns per visited 64-triangle cluster
(74 G lane-tests/s incl. the per-group scalar sync) + ~2us fixed per
tile. Unvisited clusters cost nothing.

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

from .intersect import LANES, PARALLEL_EPS

F32_MAX = 3.4e38         # python float: traced constants can't be captured
SENTINEL = 3.0e37        # entry >= SENTINEL marks an unreachable cluster

CLUSTER_SIZE = 64
ROWS = 8                 # rays per tile = ROWS x LANES = 1024: one native
                         # f32 (8,128) vreg per elementwise op
G = 4                    # clusters per DMA group (t_lim sync amortizer)
WOOP_F = 14              # floats per triangle row: 12 inverse-basis
                         # values + |n| + material alpha (transmittance)
C_ALIGN = 1024           # cluster count padding: visit-list rows are
                         # (C/128, 128) SMEM blocks, sublane dim must be
                         # a multiple of 8


class Clusters(NamedTuple):
    """Host-built cluster tables (device arrays). The cluster count is
    padded to a multiple of C_ALIGN; padded clusters have inverted AABBs
    (min=+inf, max=-inf) so no beam ever reaches them."""
    aabb: jnp.ndarray      # [C, 8] f32: min(3), max(3), 2 pad
    woop: jnp.ndarray      # [C, 8, 128] f32: CLUSTER_SIZE*WOOP_F packed
                           # rows + pad; one native tile per cluster
    tri_idx: jnp.ndarray   # [C, CLUSTER_SIZE] i32 original ids, -1 pad
    scene_lo: jnp.ndarray  # [3] f32 scene bound (ray-sort quantization)
    scene_hi: jnp.ndarray  # [3] f32

    @property
    def n_clusters(self) -> int:
        return self.aabb.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.tri_idx.shape[1]


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
    """[T, WOOP_F] layout r1(3) c1 r2(3) c2 r3'(3) c3' nlen alpha.

    The r3/c3 row is PRESCALED by |n| (r3' = r3*|n|, c3' = c3*|n|): the
    scale cancels in t = -w_o'/w_d', and w_d' = d.r3' IS the reference's
    parallel-test quantity d.n_hat — so the kernel's per-triangle test
    reads 12 scalars instead of 13 and drops a multiply. Measured effect
    on the sphere_100k wall: none (docs/PERF_R5.md — the walk is NOT
    purely scalar-load-bound as round 4's cycle count suggested); kept
    because it is strictly less work. The nlen slot stays in the layout
    (unused by the test) so nothing else moves."""
    t = rows.shape[0]
    p = np.concatenate([rows, c[:, :, None]], axis=2)        # [t, 3, 4]
    p[:, 2, :] = p[:, 2, :] * nlen[:, None]
    p = p.reshape(t, 12)
    return np.concatenate([p, nlen[:, None], alpha[:, None]],
                          axis=1).astype(np.float32)


def build_clusters(verts: np.ndarray, cluster_size: int = CLUSTER_SIZE,
                   alphas: np.ndarray = None) -> Clusters:
    """Median-split grouping of triangles into padded fixed-size clusters.
    ``alphas``: per-triangle material opacity for the transmittance kernel
    (defaults to fully opaque)."""
    assert cluster_size * WOOP_F <= 8 * 128, "cluster row must fit one tile"
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

    cnum = -(-len(groups) // C_ALIGN) * C_ALIGN
    rows, cvec, nlen = woop_rows(verts)
    w = pack_woop(rows, cvec, nlen, np.asarray(alphas, np.float32))

    aabb = np.zeros((cnum, 8), np.float32)
    aabb[:, :3] = np.float32(3.4e38)       # padded clusters: empty boxes
    aabb[:, 3:6] = np.float32(-3.4e38)
    woop = np.zeros((cnum, 8 * 128), np.float32)
    tri_idx = np.full((cnum, cluster_size), -1, np.int32)
    for ci, idx in enumerate(groups):
        aabb[ci, :3] = lo[idx].min(axis=0)
        aabb[ci, 3:6] = hi[idx].max(axis=0)
        woop[ci, :len(idx) * WOOP_F] = w[idx].reshape(-1)
        tri_idx[ci, :len(idx)] = idx

    return Clusters(aabb=jnp.asarray(aabb),
                    woop=jnp.asarray(woop.reshape(cnum, 8, 128)),
                    tri_idx=jnp.asarray(tri_idx),
                    scene_lo=jnp.asarray(lo.min(axis=0).astype(np.float32)),
                    scene_hi=jnp.asarray(hi.max(axis=0).astype(np.float32)))


def _scene_bounds_row(aabb):
    """[1, 8] f32: union of real cluster AABBs (padded clusters carry
    inverted boxes and vanish under the min/max)."""
    lo = jnp.min(aabb[:, :3], axis=0)
    hi = jnp.max(aabb[:, 3:6], axis=0)
    return jnp.concatenate([lo, hi, jnp.zeros((2,), jnp.float32)])[None, :]


def _visit_lists(aabb, ox, oy, oz, dx, dy, dz, live, dist, rows):
    """Per-tile front-to-back visit lists, computed in plain XLA.

    Each tile of rows*LANES rays is reduced to an interval beam (origin
    box x direction box x max distance over LIVE lanes); the beam is
    slab-tested against every cluster AABB with outward-conservative
    interval arithmetic (a cluster any live lane could hit always
    survives; over-acceptance costs speed, never correctness). Reachable
    clusters are sorted by conservative entry distance; unreachable ones
    get +inf-sentinel entries and sort to the tail.

    Returns (vlist i32 [nt*(C/128), 128], ventry f32 same) shaped for
    (C/128, 128) SMEM blocks.
    """
    n = ox.shape[0]
    nt = n // (rows * LANES)
    c = aabb.shape[0]
    big = jnp.float32(F32_MAX)
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
    if dist is not None:
        # segment-hull clip (shadow/transmittance rays have KNOWN
        # endpoints): every point of every live segment lies in the AABB
        # of {origins} ∪ {endpoints}, so clusters outside it are
        # unreachable. Interval beam arithmetic cannot see that shadow
        # rays CONVERGE on the light — its lateral spread at distance t
        # is origin-box + t·(direction box), which for a tile of rays
        # aimed at one small emitter overestimates wildly; the hull of
        # the two endpoint sets is tight. Conservative: pure box logic,
        # no division. Measured on sphere_100k d0 shadow rays: mean
        # reachable clusters/tile 143 -> 32.
        ex = rs(ox + dist * dx)
        ey = rs(oy + dist * dy)
        ez = rs(oz + dist * dz)
        big_ = jnp.float32(F32_MAX)
        exl = lambda a: jnp.min(jnp.where(lv, a, big_), axis=1)
        exh = lambda a: jnp.max(jnp.where(lv, a, -big_), axis=1)
        el = jnp.stack([exl(ex), exl(ey), exl(ez)], 1)[:, None, :]
        eh = jnp.stack([exh(ex), exh(ey), exh(ez)], 1)[:, None, :]
        hull_lo = jnp.minimum(ol, el)
        hull_hi = jnp.maximum(oh, eh)
        margin = 1e-5 * jnp.maximum(jnp.abs(hull_lo),
                                    jnp.abs(hull_hi)) + 1e-4
        hull_lo = hull_lo - margin
        hull_hi = hull_hi + margin
        reach = reach & (bl <= hull_hi) & (bh >= hull_lo)
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
    ok = jnp.all(reach, axis=2) & (t_in <= t_out) & (t_in <= tmax[:, None])
    # entries clamped at 0 so "every lane resolved" (t_lim = 0) exits
    entry = jnp.where(ok, jnp.maximum(t_in, 0.0), big)
    ids = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :], (nt, c))
    entry_s, ids_s = jax.lax.sort((entry, ids), dimension=1, num_keys=1)
    return (ids_s.reshape(nt * (c // 128), 128),
            entry_s.reshape(nt * (c // 128), 128))


def _woop12(wread, slot, g, k):
    base = k * WOOP_F
    return [wread(slot, g, base + j) for j in range(12)]


def _test(wread, slot, g, k, rox, roy, roz, rdx, rdy, rdz):
    """12-scalar-load triangle test: the r3/c3 row arrives prescaled by
    |n| (pack_woop), so w_d IS d.n_hat and no separate nlen load or
    multiply is needed."""
    (r1x, r1y, r1z, c1, r2x, r2y, r2z, c2,
     r3x, r3y, r3z, c3) = _woop12(wread, slot, g, k)
    w_o = rox * r3x + roy * r3y + roz * r3z - c3
    w_d = rdx * r3x + rdy * r3y + rdz * r3z
    inv = 1.0 / w_d
    t = -w_o * inv
    u = (rox * r1x + roy * r1y + roz * r1z - c1) + \
        t * (rdx * r1x + rdy * r1y + rdz * r1z)
    v = (rox * r2x + roy * r2y + roz * r2z - c2) + \
        t * (rdx * r2x + rdy * r2y + rdz * r2z)
    return t, u, v, w_d


def _walk_kernel(mode, cluster_size, vlist, ventry, sb_ref, aabb_ref,
                 ins, outs, woop_hbm, wbuf, sems, tlim, iss):
    """Shared visit-walk skeleton: double-buffered manual DMA over the
    tile's sorted cluster list, exiting at the first entry >= t_lim."""
    nc = vlist.shape[0] * vlist.shape[1]      # clusters in this tile's list
    ng = nc // G

    if mode == "nearest":
        ox, oy, oz, dx, dy, dz, live = ins
        t_out, idx_out, bu_out, bv_out = outs
        t_out[...] = jnp.full(t_out.shape, F32_MAX)
        idx_out[...] = jnp.full(idx_out.shape, -1, jnp.int32)
        bu_out[...] = jnp.zeros(bu_out.shape)
        bv_out[...] = jnp.zeros(bv_out.shape)
    elif mode == "anyhit":
        ox, oy, oz, dx, dy, dz, live, dist = ins
        (hit_out,) = outs
        hit_out[...] = jnp.zeros(hit_out.shape, jnp.int32)
        rdist = dist[...]
    else:                                     # transmit
        ox, oy, oz, dx, dy, dz, live, dist = ins
        (trans_out,) = outs
        trans_out[...] = jnp.ones(trans_out.shape, jnp.float32)
        rdist = dist[...]

    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    lv = live[...] > 0.0

    if mode == "nearest":
        # Early-termination limit: a cluster at entry e can be skipped
        # once every live lane has either a hit nearer than e or has
        # LEFT THE SCENE BOUNDS before e (no geometry outside the root
        # AABB can ever be hit, BoundBox.hpp slab semantics). Without the
        # exit cap a single miss lane (t_best = +inf) pins tlim at +inf
        # and the tile walks its whole reachable set.
        blo_x, blo_y, blo_z = sb_ref[0, 0], sb_ref[0, 1], sb_ref[0, 2]
        bhi_x, bhi_y, bhi_z = sb_ref[0, 3], sb_ref[0, 4], sb_ref[0, 5]
        inv = lambda c: 1.0 / jnp.where(c == 0.0, 1e-30, c)
        ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)
        t0x = (blo_x - rox) * ix
        t1x = (bhi_x - rox) * ix
        t0y = (blo_y - roy) * iy
        t1y = (bhi_y - roy) * iy
        t0z = (blo_z - roz) * iz
        t1z = (bhi_z - roz) * iz
        t_exit = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
        t_exit = jnp.maximum(t_exit, 0.0) * 1.001 + 1e-3
        tlim[0] = jnp.max(jnp.where(lv, t_exit, 0.0))
    else:
        # beyond the farthest live lane's endpoint nothing can occlude
        tlim[0] = jnp.max(jnp.where(lv, rdist, 0.0))

    def lid(p):
        p = jnp.minimum(p, nc - 1)
        return vlist[p // 128, p % 128]

    def ent(p):
        p = jnp.minimum(p, nc - 1)
        return ventry[p // 128, p % 128]

    def dma(slot, grp):
        for g in range(G):
            cid = lid(grp * G + g)
            pltpu.make_async_copy(
                woop_hbm.at[cid], wbuf.at[slot, g], sems.at[slot, g]).start()

    def dma_wait(slot, grp):
        for g in range(G):
            cid = lid(grp * G + g)
            pltpu.make_async_copy(
                woop_hbm.at[cid], wbuf.at[slot, g], sems.at[slot, g]).wait()

    def wread(slot, g, e):
        return wbuf[slot, g, e // 128, e % 128]

    def cluster_gate(cid, bound):
        """Per-lane slab test of the whole tile against cluster ``cid``'s
        AABB with per-lane upper bound ``bound`` -> scalar any().

        The tile-level visit list + t_lim can only reason about the
        UNION of the lanes; this gate asks the exact per-lane question
        ("could ANY lane still improve inside this box?") for ~30 vector
        ops + one reduction, and skips the cluster_size*~28-op triangle
        block when the answer is no — the common case mid-walk once
        lanes hold nearby hits."""
        inv = lambda c: 1.0 / jnp.where(c == 0.0, 1e-30, c)
        ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)
        # aabb_ref packs 16 clusters per 128-wide row (SMEM pads each
        # array row to 512 bytes, so a [C, 8] layout would burn 1 MB)
        row = cid // 16
        col = (cid % 16) * 8
        t0x = (aabb_ref[row, col + 0] - rox) * ix
        t1x = (aabb_ref[row, col + 3] - rox) * ix
        t0y = (aabb_ref[row, col + 1] - roy) * iy
        t1y = (aabb_ref[row, col + 4] - roy) * iy
        t0z = (aabb_ref[row, col + 2] - roz) * iz
        t1z = (aabb_ref[row, col + 5] - roz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        return jnp.any((tmin <= tmax) & (tmax >= 0.0) & (tmin < bound)
                       & lv)

    iss[0] = -1

    @pl.when(ent(0) < SENTINEL)
    def _prologue():
        dma(0, 0)
        iss[0] = 0

    def cond(s):
        return jnp.logical_and(s < ng, ent(s * G) < tlim[0])

    def body(s):
        slot = jnp.mod(s, 2)
        nxt = s + 1

        @pl.when(jnp.logical_and(nxt < ng, ent(nxt * G) < tlim[0]))
        def _():
            dma(jnp.mod(nxt, 2), nxt)
            iss[0] = nxt

        dma_wait(slot, s)

        if mode == "nearest":
            for g in range(G):
                pos = s * G + g
                cid = lid(pos)
                gate = jnp.logical_and(ent(pos) < SENTINEL,
                                       cluster_gate(cid, t_out[...]))

                @pl.when(gate)
                def _(g=g, cid=cid):
                    t_best = t_out[...]
                    idx_best = idx_out[...]
                    bu_best = bu_out[...]
                    bv_best = bv_out[...]
                    for k in range(cluster_size):
                        t, u, v, dn = _test(wread, slot, g, k, rox, roy,
                                            roz, rdx, rdy, rdz)
                        ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                            (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                            (1.0 - u - v > 0.0) & (t < t_best)
                        t_best = jnp.where(ok, t, t_best)
                        idx_best = jnp.where(ok, cid * cluster_size + k,
                                             idx_best)
                        bu_best = jnp.where(ok, u, bu_best)
                        bv_best = jnp.where(ok, v, bv_best)
                    t_out[...] = t_best
                    idx_out[...] = idx_best
                    bu_out[...] = bu_best
                    bv_out[...] = bv_best
            tlim[0] = jnp.minimum(
                tlim[0],
                jnp.max(jnp.where(lv, jnp.minimum(t_out[...], t_exit),
                                  0.0)))
        elif mode == "anyhit":
            for g in range(G):
                pos = s * G + g
                cid = lid(pos)
                unresolved = jnp.where(hit_out[...] == 0, rdist, 0.0)
                gate = jnp.logical_and(ent(pos) < SENTINEL,
                                       cluster_gate(cid, unresolved))

                @pl.when(gate)
                def _(g=g):
                    blocked = hit_out[...]
                    for k in range(cluster_size):
                        t, u, v, dn = _test(wread, slot, g, k, rox, roy,
                                            roz, rdx, rdy, rdz)
                        ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                            (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                            (1.0 - u - v > 0.0) & \
                            (t < rdist) & \
                            (jnp.abs(t - rdist) >= PARALLEL_EPS)
                        blocked = blocked | ok.astype(jnp.int32)
                    hit_out[...] = blocked
            # a lane stops mattering once blocked; exit when the farthest
            # still-unblocked live endpoint precedes every later cluster
            tlim[0] = jnp.max(
                jnp.where(lv & (hit_out[...] == 0), rdist, 0.0))
        else:                                 # transmit: no early exit
            for g in range(G):
                pos = s * G + g
                cid = lid(pos)
                gate = jnp.logical_and(ent(pos) < SENTINEL,
                                       cluster_gate(cid, rdist))

                @pl.when(gate)
                def _(g=g):
                    trans = trans_out[...]
                    for k in range(cluster_size):
                        t, u, v, dn = _test(wread, slot, g, k, rox, roy,
                                            roz, rdx, rdy, rdz)
                        ok = (jnp.abs(dn) >= PARALLEL_EPS) & \
                            (t > 0.0) & (u > 0.0) & (v > 0.0) & \
                            (1.0 - u - v > 0.0) & (t < rdist)
                        a = wread(slot, g, k * WOOP_F + 13)
                        trans = trans * jnp.where(ok, 1.0 - a, 1.0)
                    trans_out[...] = trans

        return s + 1

    s_exit = jax.lax.while_loop(cond, body, 0)

    # a DMA issued for the group past the exit point was never waited;
    # drain it so no semaphore leaks into the next grid step
    @pl.when(iss[0] >= s_exit)
    def _drain():
        dma_wait(jnp.mod(iss[0], 2), iss[0])

    import os as _os
    if mode == "nearest" and _os.environ.get("TUTU_DEBUG_VISITS"):
        # diagnostics: overwrite bu with the group count actually walked
        bu_out[...] = jnp.full(bu_out.shape, s_exit.astype(jnp.float32))


def _kernel_nearest(vlist, ventry, sb_ref, aabb_ref, ox, oy, oz, dx, dy,
                    dz, live, woop_hbm, t_out, idx_out, bu_out, bv_out,
                    wbuf, sems, tlim, iss, *, cluster_size):
    _walk_kernel("nearest", cluster_size, vlist, ventry, sb_ref, aabb_ref,
                 (ox, oy, oz, dx, dy, dz, live),
                 (t_out, idx_out, bu_out, bv_out),
                 woop_hbm, wbuf, sems, tlim, iss)


def _kernel_anyhit(vlist, ventry, sb_ref, aabb_ref, ox, oy, oz, dx, dy,
                   dz, live, dist, woop_hbm, hit_out, wbuf, sems, tlim,
                   iss, *, cluster_size):
    _walk_kernel("anyhit", cluster_size, vlist, ventry, sb_ref, aabb_ref,
                 (ox, oy, oz, dx, dy, dz, live, dist), (hit_out,),
                 woop_hbm, wbuf, sems, tlim, iss)


def _kernel_transmit(vlist, ventry, sb_ref, aabb_ref, ox, oy, oz, dx, dy,
                     dz, live, dist, woop_hbm, trans_out, wbuf, sems,
                     tlim, iss, *, cluster_size):
    """Alpha-weighted shadow transmittance: product of (1 - alpha) over
    every triangle crossed within dist (getShadowCoeffi semantics,
    BVHStrategy.hpp:13-45)."""
    _walk_kernel("transmit", cluster_size, vlist, ventry, sb_ref,
                 aabb_ref,
                 (ox, oy, oz, dx, dy, dz, live, dist), (trans_out,),
                 woop_hbm, wbuf, sems, tlim, iss)


def _walk_call(kernel, n_ray_in, n_out, out_dtypes, c, rows, nt,
               interpret):
    """pallas_call config shared by the three walk kernels."""
    r = c // 128
    tile = lambda: pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((r, 128), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, 128), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scene bounds [1,8]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster AABBs [C,8]
        ] + [tile() for _ in range(n_ray_in)] + [
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[tile() for _ in range(n_out)],
        out_shape=[
            jax.ShapeDtypeStruct((nt * rows, LANES), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[
            pltpu.SMEM((2, G, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G)),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )


@functools.partial(jax.jit,
                   static_argnames=("cluster_size", "rows", "interpret"))
def _run_nearest(aabb, tri_idx, woop, ox, oy, oz, dx, dy, dz, live,
                 cluster_size: int, rows: int, interpret: bool = False):
    n = ox.shape[0]
    nt = n // (rows * LANES)
    c = aabb.shape[0]
    vlist, ventry = _visit_lists(aabb, ox, oy, oz, dx, dy, dz, live,
                                 None, rows)
    sb = _scene_bounds_row(aabb)
    aabb_p = aabb.reshape(-1, 128)
    rs = lambda a: a.reshape(nt * rows, LANES)
    kernel = functools.partial(_kernel_nearest, cluster_size=cluster_size)
    t, virt, bu, bv = _walk_call(
        kernel, 7, 4,
        (jnp.float32, jnp.int32, jnp.float32, jnp.float32),
        c, rows, nt, interpret,
    )(vlist, ventry, sb, aabb_p, rs(ox), rs(oy), rs(oz), rs(dx), rs(dy),
      rs(dz), rs(live.astype(jnp.float32)), woop)
    # virtual id (cluster * cluster_size + k) -> original triangle id.
    # The natural 1-D gather lowers to a serial per-lane loop (7.3 ns/
    # row measured at 4.2M lanes); a >=2-column 2-D row gather takes the
    # vectorized path (2.7 ns/row), so the id rides a 2-col f32 table —
    # exact, since ids are < 2^24 (the cluster tables hit their SMEM
    # ceiling near 2M triangles, docs/PERF_R4.md).
    virt = virt.reshape(-1)
    flat = tri_idx.reshape(-1)
    flat2 = jnp.stack([flat.astype(jnp.float32)] * 2, axis=1)
    mapped = flat2[jnp.maximum(virt, 0), 0].astype(jnp.int32)
    idx = jnp.where(virt >= 0, mapped, -1)
    return t.reshape(-1), idx, bu.reshape(-1), bv.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("cluster_size", "rows", "interpret"))
def _run_anyhit(aabb, tri_idx, woop, ox, oy, oz, dx, dy, dz, dist, live,
                cluster_size: int, rows: int, interpret: bool = False):
    n = ox.shape[0]
    nt = n // (rows * LANES)
    c = aabb.shape[0]
    vlist, ventry = _visit_lists(aabb, ox, oy, oz, dx, dy, dz, live,
                                 dist, rows)
    sb = _scene_bounds_row(aabb)
    aabb_p = aabb.reshape(-1, 128)
    rs = lambda a: a.reshape(nt * rows, LANES)
    kernel = functools.partial(_kernel_anyhit, cluster_size=cluster_size)
    (hit,) = _walk_call(
        kernel, 8, 1, (jnp.int32,), c, rows, nt, interpret,
    )(vlist, ventry, sb, aabb_p, rs(ox), rs(oy), rs(oz), rs(dx), rs(dy),
      rs(dz), rs(live.astype(jnp.float32)), rs(dist), woop)
    return hit.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("cluster_size", "rows", "interpret"))
def _run_transmit(aabb, tri_idx, woop, ox, oy, oz, dx, dy, dz, dist, live,
                  cluster_size: int, rows: int, interpret: bool = False):
    n = ox.shape[0]
    nt = n // (rows * LANES)
    c = aabb.shape[0]
    vlist, ventry = _visit_lists(aabb, ox, oy, oz, dx, dy, dz, live,
                                 dist, rows)
    sb = _scene_bounds_row(aabb)
    aabb_p = aabb.reshape(-1, 128)
    rs = lambda a: a.reshape(nt * rows, LANES)
    kernel = functools.partial(_kernel_transmit, cluster_size=cluster_size)
    (trans,) = _walk_call(
        kernel, 8, 1, (jnp.float32,), c, rows, nt, interpret,
    )(vlist, ventry, sb, aabb_p, rs(ox), rs(oy), rs(oz), rs(dx), rs(dy),
      rs(dz), rs(live.astype(jnp.float32)), rs(dist), woop)
    return trans.reshape(-1)


def _live_mask(live, orig, n):
    """Default live mask: everything live, except the degenerate
    dead-lane encoding from intersect._mask_rays (origin -1e7)."""
    if live is not None:
        return live
    return orig.x > jnp.float32(-9.9e6)


def _part1by2(x, bits=8):
    """Spread the low ``bits`` bits of x so consecutive bits land 3 apart."""
    x = x & ((1 << bits) - 1)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_keys(clusters: Clusters, orig, d):
    """Sort key (25-bit int32): direction OCTANT (3 bits, high), then
    Morton of the quantized origin (6 bits per axis), then a 4-bit
    direction refinement. Sorting a bounce wavefront by this key makes
    ray tiles directionally pure AND spatially tight, which is what the
    tile-beam culling feeds on.

    Why octant-major: a beam's reachable-cluster set is bounded by its
    direction box times its origin box, and for diffuse bounce
    wavefronts the direction spread dominates — with origin-major keys
    (round 2) each 1024-lane tile contained the FULL hemisphere of
    directions and its beam reached ~65% of all clusters; leading with
    the 3 octant bits confines every tile's directions to one octant.
    Measured on sphere_100k bounce rays (1M lanes): mean reachable
    clusters per tile 1274 -> 312, nearest-kernel time 1243 -> 322 ms.

    The refinement bits also give PRIMARY rays sub-octant grouping when
    they arrive unswizzled (camera rays share one origin, so origin
    bits alone would leave them in row-major strips)."""
    ext = jnp.maximum(clusters.scene_hi - clusters.scene_lo, 1e-20)
    q = lambda o, k, s: jnp.clip(((o - clusters.scene_lo[k]) / ext[k] * s)
                                 .astype(jnp.int32), 0, int(s) - 1)
    octant = ((d.x < 0).astype(jnp.int32)
              + 2 * (d.y < 0).astype(jnp.int32)
              + 4 * (d.z < 0).astype(jnp.int32))
    mo = (_part1by2(q(orig.x, 0, 64.0), 6) |
          (_part1by2(q(orig.y, 1, 64.0), 6) << 1) |
          (_part1by2(q(orig.z, 2, 64.0), 6) << 2))
    # 10-bit 2D direction Morton (5 bits per minor axis): for camera
    # wavefronts every lane shares ONE origin cell, so without fine
    # direction bits the sort would collapse to ~8 buckets and shred the
    # caller's screen-block coherence into full-frame strips
    qd = lambda c: jnp.clip(jnp.abs(c) * 32.0, 0.0, 31.0).astype(jnp.int32)
    dx5 = qd(d.x)
    dy5 = qd(d.y)
    md = jnp.zeros_like(dx5)
    for b in range(5):
        md = md | (((dx5 >> b) & 1) << (2 * b)) | (((dy5 >> b) & 1) << (2 * b + 1))
    return (octant << 28) | (mo << 10) | md


def sorted_ray_order(clusters: Clusters, orig, d):
    """(perm, inv_perm) sorting rays by octant-Morton key."""
    keys = ray_sort_keys(clusters, orig, d)
    perm = jnp.argsort(keys)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return perm, inv


def _pad(a, n_pad, n):
    return jnp.pad(a, (0, n_pad - n)) if n_pad != n else a


def _permute_rays(perm, orig, d, live, extra=None):
    """Reorder a ray SoA by ``perm`` with ONE packed row gather.

    XLA:TPU lowers an independent gather per column to a ~14ns/element
    per-lane loop — at millions of lanes the 7-11 column gathers of a
    naive permutation cost more than the traversal kernel itself
    (measured: ~650ms of a 965ms 4.2M-lane intersect). Packing the SoA
    as [N, 8] first makes the whole permutation one row gather."""
    from ...utils.vec import Vec3
    cols = [orig.x, orig.y, orig.z, d.x, d.y, d.z,
            live.astype(jnp.float32)]
    if extra is not None:
        cols.append(extra)
    while len(cols) < 8:
        cols.append(jnp.zeros_like(cols[0]))
    rows_g = jnp.stack(cols, axis=1)[perm]
    o2 = Vec3(rows_g[:, 0], rows_g[:, 1], rows_g[:, 2])
    d2 = Vec3(rows_g[:, 3], rows_g[:, 4], rows_g[:, 5])
    lv2 = rows_g[:, 6] > 0.0
    ex2 = rows_g[:, 7] if extra is not None else None
    return o2, d2, lv2, ex2


def _unpermute4(inv, a, b, c, e):
    """Gather the float result columns back to caller order in one row
    gather; the int column rides its own gather (bitcasting small int32
    ids through float32 would make them denormals, which TPU float data
    movement flushes to zero)."""
    packed = jnp.stack([a, b, e], axis=1)[inv]
    return packed[:, 0], packed[:, 1], c[inv], packed[:, 2]


def cluster_intersect(clusters: Clusters, orig, d, rows: int = ROWS,
                      sort: bool = False, interpret: bool = False,
                      live=None):
    """Nearest triangle hit -> (t, idx, bu, bv) flat [N] (idx = -1 miss).
    ``sort=True`` reorders the wavefront by octant-Morton key first
    (worth it for incoherent bounce rays; camera rays are already
    pixel-ordered). ``live`` (bool [N], optional): lanes to consider for
    the beam/visit-list construction; defaults to the dead-lane origin
    encoding."""
    n = orig.x.shape[0]
    live = _live_mask(live, orig, n)
    if sort:
        perm, inv = sorted_ray_order(clusters, orig, d)
        o2, d2, lv2, _ = _permute_rays(perm, orig, d, live)
        t, idx, bu, bv = cluster_intersect(clusters, o2, d2,
                                           rows=rows, interpret=interpret,
                                           live=lv2)
        t, bu, idx, bv = _unpermute4(inv, t, bu, idx, bv)
        return t, idx, bu, bv
    block = rows * LANES
    n_pad = -(-n // block) * block
    p = lambda a: _pad(a, n_pad, n)
    t, idx, bu, bv = _run_nearest(
        clusters.aabb, clusters.tri_idx, clusters.woop,
        p(orig.x), p(orig.y), p(orig.z), p(d.x), p(d.y), p(d.z), p(live),
        cluster_size=clusters.cluster_size, rows=rows, interpret=interpret)
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
        perm, inv = sorted_ray_order(clusters, orig, d)
        o2, d2, lv2, dist2 = _permute_rays(perm, orig, d, live, dist)
        hit = cluster_occluded(clusters, o2, d2, dist2,
                               rows=rows, interpret=interpret, live=lv2)
        return hit[inv]
    block = rows * LANES
    n_pad = -(-n // block) * block
    p = lambda a: _pad(a, n_pad, n)
    hit = _run_anyhit(
        clusters.aabb, clusters.tri_idx, clusters.woop,
        p(orig.x), p(orig.y), p(orig.z), p(d.x), p(d.y), p(d.z), p(dist),
        p(live), cluster_size=clusters.cluster_size, rows=rows,
        interpret=interpret)
    if n_pad != n:
        hit = hit[:n]
    return hit.astype(bool)


def cluster_transmittance(clusters: Clusters, orig, d, dist,
                          rows: int = ROWS, sort: bool = False,
                          interpret: bool = False, live=None):
    """Product of (1 - alpha) over crossed triangles within dist -> [N]."""
    n = orig.x.shape[0]
    live = _live_mask(live, orig, n)
    if sort:
        perm, inv = sorted_ray_order(clusters, orig, d)
        o2, d2, lv2, dist2 = _permute_rays(perm, orig, d, live, dist)
        tr = cluster_transmittance(clusters, o2, d2, dist2,
                                   rows=rows, interpret=interpret, live=lv2)
        return tr[inv]
    block = rows * LANES
    n_pad = -(-n // block) * block
    p = lambda a: _pad(a, n_pad, n)
    tr = _run_transmit(
        clusters.aabb, clusters.tri_idx, clusters.woop,
        p(orig.x), p(orig.y), p(orig.z), p(d.x), p(d.y), p(d.z), p(dist),
        p(live), cluster_size=clusters.cluster_size, rows=rows,
        interpret=interpret)
    if n_pad != n:
        tr = tr[:n]
    return tr
