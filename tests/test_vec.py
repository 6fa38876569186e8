import jax.numpy as jnp
import numpy as np

from tuturenderer_tpu.utils.vec import (Vec3, from_stacked, local_to_world,
                                        reflect, refract, vec3)


def rand_vec(n, seed=0):
    r = np.random.RandomState(seed)
    return from_stacked(jnp.asarray(r.randn(n, 3).astype(np.float32)))


def test_basic_algebra():
    a = rand_vec(16, 1)
    b = rand_vec(16, 2)
    s = np.asarray((a + b).stack())
    np.testing.assert_allclose(s, np.asarray(a.stack()) + np.asarray(b.stack()),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dot(b)),
                               (np.asarray(a.stack()) * np.asarray(b.stack())).sum(-1),
                               rtol=1e-5, atol=1e-5)
    c = np.asarray(a.cross(b).stack())
    np.testing.assert_allclose(
        c, np.cross(np.asarray(a.stack()), np.asarray(b.stack())),
        rtol=1e-4, atol=1e-5)


def test_normalize():
    a = rand_vec(16, 3)
    n = a.normalized()
    np.testing.assert_allclose(np.asarray(n.norm()), 1.0, rtol=1e-5)


def test_reflect_is_mirror():
    n = vec3(0.0, 0.0, 1.0)
    i = vec3(1.0, 0.0, 1.0).normalized()
    r = reflect(i, n)
    np.testing.assert_allclose(np.asarray(r.stack()),
                               np.asarray(vec3(-1.0, 0.0, 1.0).normalized().stack()),
                               atol=1e-6)


def test_refract_snell():
    n = vec3(0.0, 0.0, 1.0)
    wo = vec3(0.3, 0.0, 1.0).normalized()   # points away from surface
    d, tir = refract(wo, n, 1.0, 1.5)
    assert not bool(tir)
    # Snell: sin_t = sin_i / 1.5
    sin_i = float(np.sqrt(1 - np.asarray(wo.dot(n)) ** 2))
    sin_t = float(jnp.sqrt(d.x ** 2 + d.y ** 2))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, rtol=1e-5)
    assert float(d.z) < 0  # transmitted into the surface


def test_refract_tir():
    n = vec3(0.0, 0.0, 1.0)
    wo = vec3(5.0, 0.0, 1.0).normalized()
    d, tir = refract(wo, n, 1.5, 1.0)   # dense -> sparse at grazing angle
    assert bool(tir)
    np.testing.assert_allclose(np.asarray(d.stack()), 0.0, atol=1e-7)


def test_local_to_world_preserves_z():
    n = vec3(0.3, -0.5, 0.8).normalized()
    w = local_to_world(n, vec3(0.0, 0.0, 1.0))
    np.testing.assert_allclose(np.asarray(w.stack()), np.asarray(n.stack()),
                               atol=1e-5)
    # orthogonal local x maps to something orthogonal to n
    w2 = local_to_world(n, vec3(1.0, 0.0, 0.0))
    np.testing.assert_allclose(float(w2.dot(n)), 0.0, atol=1e-5)
