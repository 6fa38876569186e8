"""Golden-image validation against the reference C++ renderer.

The goldens in golden/*.ppm are produced by the reference renderer itself,
compiled with g++ (golden/build_ref.sh; single-threaded to dodge its
thread-arg lifetime bug) and run on the reference Cornell assets at
matched resolution/spp/camera. RNG streams differ, so the comparison is
statistical: block-downsampled means and whole-image statistics.

These renders take minutes on the CI CPU; enable with TUTU_GOLDEN=1
(the bench/driver environment runs them on the TPU).
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "golden")

pytestmark = pytest.mark.skipif(
    os.environ.get("TUTU_GOLDEN") != "1",
    reason="golden comparisons are slow; set TUTU_GOLDEN=1")


def block_mean(img, b):
    h, w, c = img.shape
    return img.reshape(h // b, b, w // b, b, c).mean(axis=(1, 3))


def test_cornell_matches_reference_golden():
    from tuturenderer_tpu.io.ppm import read_ppm
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.options import RenderOptions
    from tuturenderer_tpu.scene.presets import cornell_box

    path = os.path.join(GOLDEN_DIR, "cornell_128.ppm")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    golden = read_ppm(path)           # gamma-0.78 quantized by the reference

    scene, cam = cornell_box(width=128, height=128)
    img = np.asarray(render(scene, cam, RenderOptions(spp=64), seed=3))
    ours = np.clip(img, 0.0, 1.0) ** 0.78

    g8 = block_mean(golden, 16)
    o8 = block_mean(ours, 16)
    # measured on TPU (seed 3): mean diff 0.0014, mean abs diff 0.0217,
    # max block diff 0.0427 — thresholds sized to ~1.5x the observed
    # 64-spp Monte Carlo noise between independent RNG streams
    assert np.abs(g8 - o8).max() < 0.06, \
        f"max block diff {np.abs(g8 - o8).max():.4f}"
    assert np.abs(golden - ours).mean() < 0.035
    assert abs(golden.mean() - ours.mean()) < 0.01


def test_veach_bdpt_matches_reference_golden():
    """The flagship BDPT scene (src/main.cpp:24-86, README.md:112-116):
    two area lights + perfect dielectric + GGX lamp, rendered with the
    bidirectional integrator and compared against the reference oracle
    at 160x120 / 64 spp (golden/veach_160.txt)."""
    from tuturenderer_tpu.io.ppm import read_ppm
    from tuturenderer_tpu.integrators.bdpt import render
    from tuturenderer_tpu.options import RenderOptions
    from tuturenderer_tpu.scene.presets import veach_bdpt

    path = os.path.join(GOLDEN_DIR, "veach_160.ppm")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    golden = read_ppm(path)

    scene, cam = veach_bdpt(width=160, height=120)
    img = np.asarray(render(scene, cam, RenderOptions(spp=64), seed=7))
    ours = np.clip(img, 0.0, 1.0) ** 0.78

    g8 = block_mean(golden, 8)     # 20x15 blocks of 8x8
    o8 = block_mean(ours, 8)
    # BDPT at 64 spp is noisier than PT (firefly-prone t=1 splats near the
    # very bright small light, emission ~3500); thresholds sized to ~1.5x
    # the measured TPU-vs-oracle differences at seed 7
    assert np.abs(g8 - o8).max() < 0.12, \
        f"max block diff {np.abs(g8 - o8).max():.4f}"
    assert np.abs(golden - ours).mean() < 0.05, \
        f"mean abs diff {np.abs(golden - ours).mean():.4f}"
    assert abs(golden.mean() - ours.mean()) < 0.02, \
        f"mean diff {abs(golden.mean() - ours.mean()):.4f}"


def test_light_tracing_matches_reference_golden():
    """Light tracing against the reference oracle (integrator light,
    LightTracing.hpp:25-206) on Cornell at 128x128 / 64 spp
    (golden/cornell_light_128.txt): direct visible-light splats + one
    vertex-connection bounce (the leaked MAXDEPTH=2). The one semantic
    deviation — our deterministic max-combine replaces the reference's
    write-order-dependent setRGB overwrite for the direct splat
    (light.py module docstring) — stays within these statistical bounds.
    Measured (seed 5): mean diff 0.0019, mean abs diff 0.020, max 16x16
    block diff 0.045; thresholds ~1.5x."""
    from tuturenderer_tpu.io.ppm import read_ppm
    from tuturenderer_tpu.integrators.light import render
    from tuturenderer_tpu.options import RenderOptions
    from tuturenderer_tpu.scene.presets import cornell_box

    path = os.path.join(GOLDEN_DIR, "cornell_light_128.ppm")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    golden = read_ppm(path)

    scene, cam = cornell_box(width=128, height=128)
    img = np.asarray(render(scene, cam,
                            RenderOptions(spp=64, lt_max_depth=2), seed=5))
    ours = np.clip(img, 0.0, 1.0) ** 0.78

    g8 = block_mean(golden, 16)
    o8 = block_mean(ours, 16)
    assert np.abs(g8 - o8).max() < 0.07, \
        f"max block diff {np.abs(g8 - o8).max():.4f}"
    assert np.abs(golden - ours).mean() < 0.032
    assert abs(golden.mean() - ours.mean()) < 0.01
