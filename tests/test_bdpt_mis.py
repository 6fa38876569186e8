"""BDPT MIS partition-of-unity check.

For one fixed 2-segment path (camera -> floor -> light) the power-
heuristic weights of the three strategies that can generate it —
(s=0,t=3) BSDF hit, (s=1,t=2) light connection, (s=2,t=1) camera splat —
must sum to EXACTLY 1 when computed from each strategy's own vertex
representation. This validates the whole pdf bookkeeping chain
(projected-solid-angle conventions, camera/light endpoint re-derivation,
geometry-term pairing) against itself.

The production code also reproduces the reference's small-weight kill
(w < MIN_DIVISOR -> 0, BDPT.hpp:218-219), which deliberately loses a few
percent of energy (the reference README itself reports its BDPT as only
"95% similar" to its PT); the partition check runs with the kill
disabled.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuturenderer_tpu.materials import bxdf_pdf, gather_material
from tuturenderer_tpu.utils.vec import Vec3


def v3(x, y, z):
    return Vec3(jnp.asarray([x], jnp.float32), jnp.asarray([y], jnp.float32),
                jnp.asarray([z], jnp.float32))


def test_mis_weights_partition_unity(monkeypatch):
    import tuturenderer_tpu.integrators.bdpt as B
    from tests.test_grad import diffuse_box
    monkeypatch.setattr(B, "MIN_DIVISOR", 0.0)

    scene, cam = diffuse_box(8)
    eta = scene.eta
    geo = B.geo
    cpos = v3(0, 0, -3.2)
    cfwd = v3(0, 0, 1)
    vpos = v3(0.2, -1.0, 0.0)
    vng = v3(0, 1, 0)
    lpos = v3(0.1, 1.0 - 1e-3, 0.1)
    lng = v3(0, -1, 0)
    mat_v = gather_material(scene, jnp.asarray([0]))
    area0 = float(scene.light_area[0])
    pick_pdf = jnp.asarray([1.0 / (scene.n_lights * area0)], jnp.float32)

    unit = lambda a, b: (b - a).normalized(1e-20)
    d_cv = unit(cpos, vpos)
    d_vl = unit(vpos, lpos)
    pdf_v_fwd = bxdf_pdf(mat_v, d_vl, -d_cv, vng, eta) / jnp.abs(d_vl.dot(vng))
    pdf_v_rev = bxdf_pdf(mat_v, -d_cv, d_vl, vng, eta) / \
        jnp.abs((-d_cv).dot(vng))
    coscam = jnp.abs(d_cv.dot(cfwd))
    d2 = (float(cam.image_plane_dist) / coscam) ** 2
    cam_fwd0 = d2 * cam.film_area_inv / (coscam * coscam)

    one = jnp.ones((1,))
    fal = jnp.zeros((1,), bool)
    tru = jnp.ones((1,), bool)
    camv = dict(pos=cpos, ng=cfwd, ns=cfwd, params=None, tp=None,
                fwd=cam_fwd0, rev=one * float(cam.lens_area_inv), g=one,
                delta=fal, valid=tru)
    vv = dict(pos=vpos, ng=vng, ns=vng, params=mat_v, tp=None, fwd=pdf_v_fwd,
              rev=pdf_v_rev, g=geo(cpos, cfwd, vpos, vng), delta=fal,
              valid=tru)
    lv_hit = dict(pos=lpos, ng=lng, ns=lng, params=None, tp=None, fwd=one,
                  rev=one, g=geo(vpos, vng, lpos, lng), delta=fal, valid=tru,
                  light_pick_pdf=pick_pdf)
    lv0 = dict(pos=lpos, ng=lng, ns=lng, params=None, tp=None,
               fwd=one / np.pi, rev=pick_pdf, g=one, delta=fal, valid=tru)
    lv1 = dict(pos=vpos, ng=vng, ns=vng, params=mat_v, tp=None,
               fwd=pdf_v_rev, rev=pdf_v_fwd,
               g=geo(lpos, lng, vpos, vng), delta=fal, valid=tru)

    w03 = float(B.mis_weight(scene, cam, [camv, vv, lv_hit], [lv0], 0, 3, eta)[0])
    w12 = float(B.mis_weight(scene, cam, [camv, vv], [lv0], 1, 2, eta)[0])
    w21 = float(B.mis_weight(scene, cam, [camv], [lv0, lv1], 2, 1, eta)[0])
    np.testing.assert_allclose(w03 + w12 + w21, 1.0, rtol=1e-5)
    assert 0 < w21 < 1 and 0 < w12 < 1 and 0 < w03 < 1


def test_bdpt_batched_spp_matches_unbatched():
    """samples_per_launch batches spp into one (sample, pixel) wavefront
    purely for launch amortization; the counter-based RNG keys on
    (pixel-lane, sample) so the image must be bit-identical to the
    sequential schedule."""
    import dataclasses

    import numpy as np

    from tests.test_grad import diffuse_box
    from tuturenderer_tpu.integrators.bdpt import render
    from tuturenderer_tpu.options import RenderOptions

    scene, cam = diffuse_box(32)
    o1 = RenderOptions(spp=4, bdpt_max_path_length=4)
    o2 = dataclasses.replace(o1, samples_per_launch=4)
    a = np.asarray(render(scene, cam, o1, 7))
    b = np.asarray(render(scene, cam, o2, 7))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
