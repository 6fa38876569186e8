"""Debug-harness parity (SURVEY §4 "compile-time debug harnesses").

The reference validates its estimators with compile-time flags: BDPT
S_CHECK/T_CHECK isolate one strategy family, CHECK_MIS drops MIS weights
(BDPT.hpp:9-12, 490-493, 760-762), and LightTracing CHECK_LT renders a
raster-projection pass to validate the world->raster mapping
(LightTracing.hpp:5, 28-93). Here those are static RenderOptions fields /
functions, and — unlike the reference's eyeball checks — they assert:

- the s-filtered strategy images sum EXACTLY to the full BDPT render
  (the strategy enumeration is a partition);
- every primary-ray hit point projects back to its own pixel index
  (the quantitative CHECK_LT).
"""
import numpy as np

from tuturenderer_tpu.options import RenderOptions


def test_bdpt_strategy_isolation_partitions_render():
    from tests.test_grad import diffuse_box
    from tuturenderer_tpu.integrators.bdpt import render

    scene, cam = diffuse_box(12)
    base = dict(spp=2, bdpt_max_path_length=3)
    full = np.asarray(render(scene, cam, RenderOptions(**base), 5))
    parts = [np.asarray(render(scene, cam,
                               RenderOptions(bdpt_s_filter=s, **base), 5))
             for s in range(0, 4)]
    total = sum(parts)
    assert np.isfinite(full).all()
    np.testing.assert_allclose(total, full, rtol=1e-5, atol=1e-6)
    # every family contributes somewhere on a diffuse box
    for s, p in enumerate(parts[:3]):
        assert p.sum() > 0, f"s={s} family contributed nothing"


def test_bdpt_unweighted_at_least_full():
    """With MIS weights dropped, every strategy counts its full unweighted
    contribution, so the image mean can only go up (weights are in
    [0,1])."""
    from tests.test_grad import diffuse_box
    from tuturenderer_tpu.integrators.bdpt import render

    scene, cam = diffuse_box(12)
    base = dict(spp=2, bdpt_max_path_length=3)
    full = np.asarray(render(scene, cam, RenderOptions(**base), 7))
    unw = np.asarray(render(scene, cam,
                            RenderOptions(bdpt_unweighted=True, **base), 7))
    assert np.isfinite(unw).all()
    assert unw.mean() >= full.mean() * (1.0 - 1e-6)
    assert unw.mean() > full.mean() * 1.05   # double counting is visible


def test_raster_projection_roundtrip():
    from tests.test_grad import diffuse_box
    from tuturenderer_tpu.integrators.light import (raster_check,
                                                    raster_roundtrip_error)

    scene, cam = diffuse_box(32)
    err = float(raster_roundtrip_error(scene, cam))
    assert err < 0.01, f"{err:.4f} of hit pixels project elsewhere"

    img = np.asarray(raster_check(scene, cam, RenderOptions(spp=1)))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # the flat-shaded pass shows the red back wall and the emitter
    assert (img[..., 0] > img[..., 1] + 0.2).any()
    assert (img > 5.0).any()
