"""The NEE-only (MIS off) path-tracing estimator — the reference's !MIS
compile-time branch (PathTracing.hpp:281-347) with its delta handler
calcForMirror (PathTracing.hpp:50-70).

Fast structural checks run always; the mean-convergence cross-check runs
in the default suite too (TUTU_FAST=1 skips it for quick iteration).
"""
import dataclasses
import os

import numpy as np
import pytest

from tuturenderer_tpu.options import RenderOptions
from tuturenderer_tpu.scene.data import (LAMBERTIAN, PERFECT_REFLECTIVE,
                                         SceneBuilder)


def mirror_scene(n=24):
    """A 45-degree mirror reflecting an overhead area light into the camera.

    The two estimators answer differently by construction: the MIS branch
    pays the light through the BSDF-sample strategy with weight 1 at the
    delta vertex (PathTracing.hpp:252-253), while the NEE-only branch routes
    mirrors through calcForMirror, whose recursion hits the emitter at
    depth>0 and returns 0 (PathTracing.hpp:164-165) — mirror images of
    emitters are black. That asymmetry is the sharpest possible wiring test
    for opts.mis.
    """
    b = SceneBuilder()
    mirror = b.add_material(PERFECT_REFLECTIVE)
    light = b.add_material(LAMBERTIAN, diffuse=(0.7, 0.7, 0.7),
                           emission=(20.0, 20.0, 20.0))

    def quad(p0, p1, p2, p3, mat):
        v = np.asarray([[p0, p1, p2], [p0, p2, p3]], np.float32)
        b.add_triangles(v, None, None, mat)

    # mirror plane z = y, normal (0,1,-1)/sqrt2 facing the camera: the
    # (0,0,1) camera ray reflects to (0,1,0), straight up at the light
    quad((-0.8, 0.8, 0.8), (0.8, 0.8, 0.8),
         (0.8, -0.8, -0.8), (-0.8, -0.8, -0.8), mirror)
    # overhead light facing down
    quad((-1.0, 2.0, -1.0), (1.0, 2.0, -1.0),
         (1.0, 2.0, 1.0), (-1.0, 2.0, 1.0), light)
    scene = b.build()
    from tuturenderer_tpu.camera import make_camera
    cam = make_camera(n, n, 30, eye=(0, 0, -3.0), viewdir=(0, 0, 1),
                      updir=(0, 1, 0))
    return scene, cam


def test_mis_flag_selects_distinct_estimators():
    """--no-mis must change the compiled program AND the image (the flag was
    a silent no-op in round 1)."""
    from tuturenderer_tpu.integrators.path import render

    scene, cam = mirror_scene()
    opts = RenderOptions(spp=2, max_depth=3)
    img_mis = np.asarray(render(scene, cam, opts, 0))
    img_nee = np.asarray(render(scene, cam,
                                dataclasses.replace(opts, mis=False), 0))
    assert np.isfinite(img_mis).all() and np.isfinite(img_nee).all()
    assert not np.allclose(img_mis, img_nee)


def test_nee_mirror_image_of_emitter_is_black():
    """calcForMirror recursion hits the light at depth>0 -> 0; the MIS
    branch pays it at weight 1 through the delta BSDF strategy."""
    from tuturenderer_tpu.integrators.path import render

    scene, cam = mirror_scene()
    opts = RenderOptions(spp=2, max_depth=3)
    img_mis = np.asarray(render(scene, cam, opts, 0))
    img_nee = np.asarray(render(scene, cam,
                                dataclasses.replace(opts, mis=False), 0))
    bright = img_mis[..., 0] > 5.0     # the mirrored emitter, in MIS mode
    assert bright.sum() > 20           # the reflection fills the frame center
    assert img_nee[..., 0][bright].max() == 0.0


@pytest.mark.skipif(os.environ.get("TUTU_FAST") == "1",
                    reason="TUTU_FAST=1 skips the slower consistency checks")
def test_nee_converges_to_mis_mean_on_diffuse_scene():
    """On an all-Lambertian scene both estimators are unbiased for the same
    transport, so their mean images agree to Monte Carlo noise while the
    per-pixel noise pattern differs."""
    from tests.test_grad import diffuse_box
    from tuturenderer_tpu.integrators.path import render

    scene, cam = diffuse_box(48)
    opts = RenderOptions(spp=64, max_depth=4)
    img_mis = np.asarray(render(scene, cam, opts, 1))
    img_nee = np.asarray(render(scene, cam,
                                dataclasses.replace(opts, mis=False), 1))
    assert not np.allclose(img_mis, img_nee)
    rel = abs(img_mis.mean() - img_nee.mean()) / img_mis.mean()
    assert rel < 0.03, f"mis={img_mis.mean():.4f} nee={img_nee.mean():.4f}"
