"""Interpret-mode parity tests for the Pallas TPU intersection kernels
(ops/pallas/intersect.py) against the XLA dense reference path."""
import jax.numpy as jnp
import numpy as np

from tuturenderer_tpu.ops import intersect as I
from tuturenderer_tpu.ops.pallas.intersect import (pallas_tri_intersect,
                                                   pallas_tri_occluded)
from tuturenderer_tpu.scene.data import SceneBuilder
from tuturenderer_tpu.utils.vec import Vec3


def random_scene_and_rays(n_tris=48, n_rays=256, seed=3):
    r = np.random.RandomState(seed)
    b = SceneBuilder()
    m = b.add_material()
    centers = r.randn(n_tris, 3) * 2.0
    b.add_triangles(
        (centers[:, None, :] + 0.6 * r.randn(n_tris, 3, 3)).astype(np.float32),
        None, None, m)
    s = b.build()
    o_np = (r.randn(n_rays, 3) * 3.0).astype(np.float32)
    d_np = r.randn(n_rays, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d_np[:, i]) for i in range(3)])
    return s, o, d


def xla_core(s, o, d):
    old = I.DENSE_IMPL
    I.DENSE_IMPL = "mt"
    try:
        return I.intersect_core(s, o, d)
    finally:
        I.DENSE_IMPL = old


def test_pallas_nearest_matches_xla():
    s, o, d = random_scene_and_rays()
    ref = xla_core(s, o, d)
    t, idx, bu, bv = pallas_tri_intersect(s, o, d, interpret=True)
    hit_p = np.asarray(idx) >= 0
    hit_r = np.asarray(ref.hit)
    agree = hit_p == hit_r
    assert agree.mean() > 0.99          # knife-edge float divergence only
    both = hit_p & hit_r & (np.asarray(idx) == np.asarray(ref.idx))
    assert both.sum() > 0.95 * hit_r.sum()
    np.testing.assert_allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bu)[both], np.asarray(ref.bu)[both],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(bv)[both], np.asarray(ref.bv)[both],
                               atol=1e-4)


def test_pallas_anyhit_matches_xla_occlusion():
    s, o, d = random_scene_and_rays(seed=7)
    ref = xla_core(s, o, d)
    for scale in (0.5, 1.0, 2.0):
        t_ref = np.asarray(jnp.where(ref.hit, ref.t, 1.0))
        dist = jnp.asarray(t_ref * scale + 0.3)
        want = np.asarray(ref.hit) & (np.asarray(ref.t) < np.asarray(dist)) & \
            (np.abs(np.asarray(ref.t) - np.asarray(dist)) >= I.PARALLEL_EPS)
        got = np.asarray(pallas_tri_occluded(s, o, d, dist, interpret=True))
        assert (got == want).mean() > 0.99


def test_pallas_anyhit_endpoint_guard():
    """dist exactly at the hit distance -> not occluded (BVH.hpp:184)."""
    b = SceneBuilder()
    m = b.add_material()
    b.add_triangles(
        np.asarray([[[-1, -1, 1], [1, -1, 1], [0, 1, 1]]], np.float32),
        None, None, m)
    s = b.build()
    o = Vec3(jnp.zeros((4,)), jnp.zeros((4,)), jnp.zeros((4,)))
    d = Vec3(jnp.zeros((4,)), jnp.zeros((4,)), jnp.ones((4,)))
    # within-eps endpoint (1.0, 1.0+5e-5) -> unoccluded; beyond eps -> occluded
    dist = jnp.asarray([2.0, 1.0, 0.5, 1.0 + 5e-5])
    got = np.asarray(pallas_tri_occluded(s, o, d, dist, interpret=True))
    assert got.tolist() == [True, False, False, False]


def test_cluster_kernels_match_xla():
    """Streaming cluster-culling kernels (large-scene path) vs XLA dense."""
    from tuturenderer_tpu.ops.pallas.cluster import (cluster_intersect,
                                                     cluster_occluded)
    r = np.random.RandomState(5)
    b = SceneBuilder()
    m = b.add_material()
    centers = r.randn(400, 3) * 3.0
    b.add_triangles(
        (centers[:, None, :] + 0.5 * r.randn(400, 3, 3)).astype(np.float32),
        None, None, m)
    s = b.build(use_bvh=True)          # forces clusters + BVH build
    assert s.clusters is not None and s.clusters.n_clusters > 1

    n = 128
    o_np = (r.randn(n, 3) * 4.0).astype(np.float32)
    d_np = r.randn(n, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d_np[:, i]) for i in range(3)])

    ref = xla_core(s, o, d)
    t, idx, bu, bv = cluster_intersect(s.clusters, o, d, rows=8,
                                       interpret=True)
    hit_p = np.asarray(idx) >= 0
    hit_r = np.asarray(ref.hit)
    assert (hit_p == hit_r).mean() > 0.99
    both = hit_p & hit_r & (np.asarray(idx) == np.asarray(ref.idx))
    assert both.sum() > 0.95 * hit_r.sum()
    np.testing.assert_allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bu)[both], np.asarray(ref.bu)[both],
                               atol=1e-4)

    t_ref = np.asarray(jnp.where(ref.hit, ref.t, 1.0))
    dist = jnp.asarray(t_ref + 0.5)
    want = np.asarray(ref.hit) & (np.asarray(ref.t) < np.asarray(dist)) & \
        (np.abs(np.asarray(ref.t) - np.asarray(dist)) >= I.PARALLEL_EPS)
    got = np.asarray(cluster_occluded(s.clusters, o, d, dist, rows=8,
                                      interpret=True))
    assert (got == want).mean() > 0.99


def test_cluster_sorted_matches_unsorted():
    """Octant-Morton ray sorting must not change results."""
    from tuturenderer_tpu.ops.pallas.cluster import cluster_intersect
    r = np.random.RandomState(9)
    b = SceneBuilder()
    m = b.add_material()
    centers = r.randn(300, 3) * 3.0
    b.add_triangles(
        (centers[:, None, :] + 0.5 * r.randn(300, 3, 3)).astype(np.float32),
        None, None, m)
    s = b.build(use_bvh=True)
    n = 128
    o_np = (r.randn(n, 3) * 4.0).astype(np.float32)
    d_np = r.randn(n, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d_np[:, i]) for i in range(3)])
    t0, i0, u0, v0 = cluster_intersect(s.clusters, o, d, rows=8,
                                       interpret=True)
    t1, i1, u1, v1 = cluster_intersect(s.clusters, o, d, rows=8, sort=True,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1))


def test_cluster_transmittance_matches_dense():
    """Alpha-weighted shadow transmittance: the cluster kernel must equal
    the dense all-primitive product of (1 - alpha) over crossed
    triangles (getShadowCoeffi semantics, BVHStrategy.hpp:13-45)."""
    from tuturenderer_tpu.ops.intersect import transmittance
    from tuturenderer_tpu.ops.pallas.cluster import cluster_transmittance

    r = np.random.RandomState(11)
    b = SceneBuilder()
    m1 = b.add_material(alpha=0.3)
    m2 = b.add_material(alpha=0.85)
    centers = r.randn(300, 3) * 3.0
    tris = (centers[:, None, :] + 0.5 * r.randn(300, 3, 3)).astype(np.float32)
    b.add_triangles(tris[:150], None, None, m1)
    b.add_triangles(tris[150:], None, None, m2)
    s = b.build(use_bvh=True)
    assert s.clusters is not None

    n = 128
    o_np = (r.randn(n, 3) * 4.0).astype(np.float32)
    d_np = r.randn(n, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d_np[:, i]) for i in range(3)])
    dist = jnp.full((n,), 6.0)

    want = np.asarray(transmittance(s, o, d, dist))   # dense path on CPU
    got = np.asarray(cluster_transmittance(s.clusters, o, d, dist,
                                           interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (want < 1.0).any() and (want > 0.0).any()  # nontrivial case
