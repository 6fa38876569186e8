"""Differentiable rendering: gradients vs finite differences.

The counter-based RNG makes the estimator a deterministic function of
parameters for a fixed seed, so central finite differences of the SAME
estimator are well-defined. With detached sampling, gradients are exact
for parameters the sampler ignores (albedo, emission): radiance is
polynomial in albedo and linear in emission along each fixed path.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuturenderer_tpu.grad import MaterialParams, get_params, render_diff
from tuturenderer_tpu.options import RenderOptions
from tuturenderer_tpu.scene.data import LAMBERTIAN, SceneBuilder
from tuturenderer_tpu.utils.vec import Vec3


def diffuse_box(n=32):
    import numpy as np
    b = SceneBuilder()
    white = b.add_material(LAMBERTIAN, diffuse=(0.7, 0.7, 0.7))
    red = b.add_material(LAMBERTIAN, diffuse=(0.6, 0.1, 0.1))
    light = b.add_material(LAMBERTIAN, diffuse=(0.7, 0.7, 0.7),
                           emission=(20.0, 20.0, 20.0))

    def quad(p0, p1, p2, p3, mat):
        v = np.asarray([[p0, p1, p2], [p0, p2, p3]], np.float32)
        b.add_triangles(v, None, None, mat)

    s = 1.0
    quad((-s, -s, -s), (-s, -s, s), (s, -s, s), (s, -s, -s), white)
    quad((-s, s, -s), (s, s, -s), (s, s, s), (-s, s, s), white)
    quad((-s, -s, s), (-s, s, s), (s, s, s), (s, -s, s), red)
    q = 0.4
    quad((-q, s - 1e-3, -q), (q, s - 1e-3, -q), (q, s - 1e-3, q),
         (-q, s - 1e-3, q), light)
    scene = b.build()
    from tuturenderer_tpu.camera import make_camera
    cam = make_camera(n, n, 60, eye=(0, 0, -3.2), viewdir=(0, 0, 1),
                      updir=(0, 1, 0))
    return scene, cam


OPTS = RenderOptions(spp=2, max_depth=3, differentiable=True)


def _loss(params, scene, cam):
    img = render_diff(params, scene, cam, OPTS, seed=7)
    return jnp.mean(img)


def _fd(params, scene, cam, leaf_path, idx, eps):
    def perturb(sign):
        flat, tree = jax.tree.flatten(params)
        # leaf_path is the flat leaf index
        flat = list(flat)
        flat[leaf_path] = flat[leaf_path].at[idx].add(sign * eps)
        return jax.tree.unflatten(tree, flat)

    lp = _loss(perturb(+1.0), scene, cam)
    lm = _loss(perturb(-1.0), scene, cam)
    return (lp - lm) / (2 * eps)


@pytest.fixture(scope="module")
def setup():
    scene, cam = diffuse_box()
    params = get_params(scene)
    grad = jax.grad(_loss)(params, scene, cam)
    return scene, cam, params, grad


def test_albedo_gradient_matches_fd(setup):
    scene, cam, params, grad = setup
    flat_params, tree = jax.tree.flatten(params)
    flat_grad = jax.tree.flatten(grad)[0]
    # diffuse.x of material 0 (white walls) is flat leaf 0
    g = float(flat_grad[0][0])
    fd = float(_fd(params, scene, cam, 0, 0, 1e-2))
    assert g != 0.0
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_emission_gradient_matches_fd(setup):
    scene, cam, params, grad = setup
    flat_params, tree = jax.tree.flatten(params)
    flat_grad = jax.tree.flatten(grad)[0]
    # emission leaves follow diffuse (Vec3 x,y,z = leaves 3,4,5);
    # light material index 2
    g = float(flat_grad[3][2])
    fd = float(_fd(params, scene, cam, 3, 2, 1e-1))
    assert g != 0.0
    # emission is linear in the estimator; tolerance covers f32 FD noise
    np.testing.assert_allclose(g, fd, rtol=1e-2)


def test_red_wall_gradient_localized(setup):
    """The red wall's green channel gradient must exceed its... the white
    material dominates area; just check gradients are finite and the red
    material's diffuse gradient is nonzero."""
    scene, cam, params, grad = setup
    flat_grad = jax.tree.flatten(grad)[0]
    for leaf in flat_grad:
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(flat_grad[0][1]) != 0.0  # red material diffuse.x
