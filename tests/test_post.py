"""Post-processing vs the reference math (Postprocessor.hpp:29-197).

The reference computes-but-never-calls this pass (the mains comment it
out, main.cpp:99); here it is a live option, so its math is pinned
against an independent NumPy transcription of the C++ semantics:
separable Gaussian (KERNELSIZE=10 taps at offsets -5..4, weight
(1/sqrt(2*pi*sigma))*exp(-x^2/(2*sigma^2)), per-pixel kernel-sum
normalization, clamp-to-edge sampling, vertical then horizontal,
GAUSSIANLOOP+1 = 2 rounds), emissive extraction (|rgb| > 3 rescaled so
the max channel hits STRENGTH=2, Postprocessor.hpp:122-148), and
exposure tone map 1 - exp(-c*1.5) (Postprocessor.hpp:173-197).
"""
import numpy as np
import pytest

from tuturenderer_tpu.post import (EXPOSURE, GAUSSIANLOOP, KERNELSIZE,
                                   STDDEV, STRENGTH, bloom_and_tonemap,
                                   bloom_only, extract_emissive,
                                   gaussian_blur, hdr_only,
                                   tonemap_exposure)


def ref_gauss_weights():
    # gaussian lambda, Postprocessor.hpp:77-80 (incl. the sqrt(2*pi*sigma)
    # — not sigma^2 — quirk and the truncated E constant)
    E = 2.7182818
    start = int(-KERNELSIZE * 0.5)
    xs = np.arange(start, start + KERNELSIZE, dtype=np.float64)
    w = (1.0 / np.sqrt(2 * np.pi * STDDEV)) * E ** (
        -(xs * xs) / (2 * STDDEV * STDDEV))
    return xs.astype(int), w


def ref_blur_once(img):
    """getGaussianBlurTexture (Postprocessor.hpp:63-119): vertical pass
    then horizontal, clamp-to-edge, per-pixel kernelSum normalization."""
    offs, w = ref_gauss_weights()
    h, wd, _ = img.shape
    out = np.zeros_like(img)
    for i, off in enumerate(offs):
        ys = np.clip(np.arange(h) + off, 0, h - 1)
        out += w[i] * img[ys, :, :]
    out /= w.sum()
    out2 = np.zeros_like(out)
    for i, off in enumerate(offs):
        xs = np.clip(np.arange(wd) + off, 0, wd - 1)
        out2 += w[i] * out[:, xs, :]
    out2 /= w.sum()
    return out2


def ref_emissive(img):
    norm = np.sqrt((img ** 2).sum(-1, keepdims=True))
    mx = img.max(-1, keepdims=True)
    rescaled = img / np.maximum(mx, 1e-20) * STRENGTH
    return np.where(norm > 3.0, rescaled, 0.0)


def ref_pipeline(img):
    em = ref_emissive(img)
    for _ in range(GAUSSIANLOOP + 1):
        em = ref_blur_once(em)
    return 1.0 - np.exp(-(img + em) * EXPOSURE)


def test_gaussian_taps_match_reference_formula():
    from tuturenderer_tpu.post import _gaussian_kernel
    k, start = _gaussian_kernel()
    offs, w = ref_gauss_weights()
    assert start == offs[0] == -5
    np.testing.assert_allclose(np.asarray(k), w / w.sum(), rtol=1e-5)


def test_blur_delta_image_matches_reference():
    img = np.zeros((9, 9, 3), np.float32)
    img[4, 4, :] = 1.0
    got = np.asarray(gaussian_blur(img))
    want = ref_blur_once(img)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_blur_edge_clamping():
    # a corner delta exercises the clamp-to-edge taps
    img = np.zeros((8, 8, 3), np.float32)
    img[0, 0, 0] = 2.0
    np.testing.assert_allclose(np.asarray(gaussian_blur(img)),
                               ref_blur_once(img), rtol=1e-5, atol=1e-7)


def test_emissive_extract_thresholds():
    img = np.array([[[4.0, 0.0, 0.0],     # norm 4 > 3 -> (2, 0, 0)
                     [1.0, 1.0, 1.0],     # norm 1.73 -> untouched 0
                     [3.0, 3.0, 3.0],     # norm 5.2 -> (2, 2, 2)
                     [0.0, 2.0, 4.0]]],   # norm 4.47 -> (0, 1, 2)
                   np.float32)
    got = np.asarray(extract_emissive(img))
    want = np.array([[[2, 0, 0], [0, 0, 0], [2, 2, 2], [0, 1, 2]]],
                    np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_exposure_tonemap_values():
    img = np.array([[[0.0, 1.0, 10.0]]], np.float32)
    got = np.asarray(tonemap_exposure(img))
    want = 1.0 - np.exp(-img * 1.5)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.max() <= 1.0 and got.min() >= 0.0


def test_full_pipeline_matches_reference_oracle():
    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 1.0, (16, 12, 3)).astype(np.float32)
    img[3:5, 4:6] = 8.0          # an emissive blob to bloom
    got = np.asarray(bloom_and_tonemap(img))
    want = ref_pipeline(img.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # bloom spreads energy beyond the blob
    assert np.asarray(bloom_only(img))[10, 10].sum() > img[10, 10].sum()
    # HDR_ONLY pane
    np.testing.assert_allclose(np.asarray(hdr_only(img)),
                               1.0 - np.exp(-img * 1.5), rtol=1e-5,
                               atol=1e-7)


def test_cli_post_flag(tmp_path):
    cfg = tmp_path / "scene.txt"
    cfg.write_text("""imsize 32 32
eye 0 0.35 2.6
viewdir 0 -0.12 -1
updir 0 1 0
hfov 55
bkgcolor 0.05 0.05 0.08 1.0
integrator path
mtlcolor 0.9 0.9 0.9 1 1 1 1.0 1.0
emission 10 10 10
v -0.5 1.4 -0.5
v 0.5 1.4 -0.5
v 0.5 1.4 0.5
v -0.5 1.4 0.5
vn 0 -1 0
f 1//1 2//1 3//1
f 1//1 3//1 4//1
mtlcolor 0.7 0.7 0.7 1 1 1 1.0 1.0
v -2 -0.5 2
v 2 -0.5 2
v 2 -0.5 -2
v -2 -0.5 -2
f 5 6 7
f 5 7 8
""")
    out = tmp_path / "out.ppm"
    from tuturenderer_tpu.cli import main
    main([str(cfg), "--spp", "2", "--post", "-o", str(out)])
    assert out.exists()
    from tuturenderer_tpu.io.ppm import read_ppm
    img = read_ppm(str(out))
    assert np.isfinite(img).all()
    assert img.shape == (32, 32, 3)
