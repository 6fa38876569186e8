"""BSDF eval/sample/pdf checks against closed forms.

The reference ships no tests; these validate our vectorized BSDF against
analytic properties of the models in Material.hpp.
"""
import jax.numpy as jnp
import numpy as np

from tuturenderer_tpu.materials import (MatParams, bxdf_eval, bxdf_pdf,
                                        bxdf_sample, d_ndf, fresnel_ior)
from tuturenderer_tpu.scene.data import (LAMBERTIAN, MICROFACET_R,
                                         PERFECT_REFLECTIVE,
                                         PERFECT_REFRACTIVE)
from tuturenderer_tpu.utils.vec import Vec3, vec3


def make_params(n, mtype, diffuse=(0.5, 0.5, 0.5), eta=1.5, roughness=0.5,
                metallic=0.0):
    ones = jnp.ones((n,))
    t = jnp.full((n,), mtype, jnp.int32)
    v = lambda c: Vec3(ones * c[0], ones * c[1], ones * c[2])
    return MatParams(mtype=t, diffuse=v(diffuse), specular=v((1, 1, 1)),
                     emission=v((0, 0, 0)), alpha=ones, eta=ones * eta,
                     roughness=ones * roughness, metallic=ones * metallic)


def unit(n, x, y, z):
    v = np.asarray([x, y, z], np.float64)
    v = v / np.linalg.norm(v)
    return Vec3(jnp.full((n,), v[0], jnp.float32),
                jnp.full((n,), v[1], jnp.float32),
                jnp.full((n,), v[2], jnp.float32))


def test_lambertian_eval_is_albedo_over_pi():
    p = make_params(4, LAMBERTIAN, diffuse=(0.6, 0.3, 0.1))
    n = unit(4, 0, 0, 1)
    wi = unit(4, 0.2, 0.1, 1)
    wo = unit(4, -0.3, 0.2, 1)
    f = bxdf_eval(p, wi, wo, n, n, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(f.x), 0.6 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f.y), 0.3 / np.pi, rtol=1e-5)
    # below-horizon wi -> 0
    wi2 = unit(4, 0.0, 0.0, -1.0)
    f2 = bxdf_eval(p, wi2, wo, n, n, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(f2.x), 0.0, atol=1e-7)


def test_lambertian_pdf_is_cos_over_pi():
    p = make_params(1, LAMBERTIAN)
    n = unit(1, 0, 0, 1)
    wi = unit(1, 0.3, 0.0, 1.0)
    wo = unit(1, 0, 0, 1)
    pdf = float(bxdf_pdf(p, wi, wo, n, jnp.float32(1.0))[0])
    np.testing.assert_allclose(pdf, float(wi.z[0]) / np.pi, rtol=1e-5)


def test_lambertian_pdf_integrates_to_one():
    # integrate cos/pi over the hemisphere by quadrature
    p = make_params(1, LAMBERTIAN)
    n = unit(1, 0, 0, 1)
    wo = unit(1, 0, 0, 1)
    thetas = np.linspace(0, np.pi / 2, 200)
    phis = np.linspace(0, 2 * np.pi, 200)
    total = 0.0
    dt = thetas[1] - thetas[0]
    dp = phis[1] - phis[0]
    for t in thetas:
        wi = unit(1, np.sin(t), 0, np.cos(t))
        pdf = float(bxdf_pdf(p, wi, wo, n, jnp.float32(1.0))[0])
        total += pdf * np.sin(t) * dt * 2 * np.pi
    np.testing.assert_allclose(total, 1.0, rtol=2e-2)


def test_lambertian_sample_matches_pdf_histogram():
    n_s = 200_000
    p = make_params(n_s, LAMBERTIAN)
    n = unit(n_s, 0, 0, 1)
    wo = unit(n_s, 0, 0, 1)
    r = np.random.RandomState(0)
    r0 = jnp.asarray(r.rand(n_s).astype(np.float32))
    r1 = jnp.asarray(r.rand(n_s).astype(np.float32))
    lot = jnp.asarray(r.rand(n_s).astype(np.float32))
    s = bxdf_sample(p, wo, n, r0, r1, lot, jnp.float32(1.0))
    assert bool(jnp.all(s.success))
    cos = np.asarray(s.wi.z)
    # E[cos] under cos-weighted pdf = int cos * (cos/pi) = 2/3
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=5e-3)


def test_mirror_eval_and_pdf():
    p = make_params(1, PERFECT_REFLECTIVE)
    n = unit(1, 0, 0, 1)
    wo = unit(1, 0.5, 0.0, 1.0)
    wi = unit(1, -0.5, 0.0, 1.0)   # exact mirror
    f = float(bxdf_eval(p, wi, wo, n, n, jnp.float32(1.0)).x[0])
    np.testing.assert_allclose(f, 1.0 / float(n.dot(wi)[0]), rtol=1e-4)
    pdf = float(bxdf_pdf(p, wi, wo, n, jnp.float32(1.0))[0])
    np.testing.assert_allclose(pdf, 1.0)
    # non-mirror direction -> 0
    wi2 = unit(1, 0.2, 0.0, 1.0)
    assert float(bxdf_eval(p, wi2, wo, n, n, jnp.float32(1.0)).x[0]) == 0.0


def test_mirror_sample_is_reflection():
    p = make_params(1, PERFECT_REFLECTIVE)
    n = unit(1, 0, 0, 1)
    wo = unit(1, 0.5, 0.2, 1.0)
    z = jnp.zeros((1,))
    s = bxdf_sample(p, wo, n, z + 0.3, z + 0.7, z + 0.1, jnp.float32(1.0))
    expect = np.asarray([-float(wo.x[0]), -float(wo.y[0]), float(wo.z[0])])
    np.testing.assert_allclose(np.asarray(s.wi.stack())[0], expect, atol=1e-5)


def test_refractive_lottery_and_snell():
    p = make_params(1, PERFECT_REFRACTIVE, eta=1.5)
    n = unit(1, 0, 0, 1)
    wo = unit(1, 0.3, 0.0, 1.0)
    z = jnp.zeros((1,))
    # lottery below F -> reflection; above -> refraction
    f = float(fresnel_ior(wo, n, jnp.float32(1.0), jnp.float32(1.5))[0])
    s_refl = bxdf_sample(p, wo, n, z, z, z + (f * 0.5), jnp.float32(1.0))
    assert float(s_refl.wi.z[0]) > 0
    s_refr = bxdf_sample(p, wo, n, z, z, z + (f + (1 - f) * 0.5), jnp.float32(1.0))
    assert float(s_refr.wi.z[0]) < 0
    sin_i = np.sqrt(1 - float(wo.dot(n)[0]) ** 2)
    sin_t = float(jnp.sqrt(s_refr.wi.x ** 2 + s_refr.wi.y ** 2)[0])
    np.testing.assert_allclose(sin_t, sin_i / 1.5, rtol=1e-4)
    # pdf of each branch equals its lottery probability
    np.testing.assert_allclose(
        float(bxdf_pdf(p, s_refl.wi, wo, n, jnp.float32(1.0))[0]), f, rtol=1e-4)
    np.testing.assert_allclose(
        float(bxdf_pdf(p, s_refr.wi, wo, n, jnp.float32(1.0))[0]), 1 - f, rtol=1e-4)


def test_ggx_d_normalization():
    """Integral over the hemisphere of D(h) cos(h) dh == 1."""
    rough = 0.5
    thetas = np.linspace(0, np.pi / 2, 512)
    dt = thetas[1] - thetas[0]
    total = 0.0
    n = vec3(0.0, 0.0, 1.0)
    for t in thetas:
        h = vec3(float(np.sin(t)), 0.0, float(np.cos(t)))
        d = float(d_ndf(h, n, jnp.float32(rough)))
        total += d * np.cos(t) * np.sin(t) * dt * 2 * np.pi
    np.testing.assert_allclose(total, 1.0, rtol=2e-2)


def test_microfacet_r_sample_pdf_consistency():
    """Fixed GGX sampling must follow the analytic pdf: compare the
    distribution of sampled half-vector cosines against D(h)cos(h)."""
    n_s = 400_000
    rough = 0.4
    p = make_params(n_s, MICROFACET_R, roughness=rough)
    n = unit(n_s, 0, 0, 1)
    wo = unit(n_s, 0, 0, 1)   # normal incidence: wi mirrors h cleanly
    r = np.random.RandomState(1)
    r0 = jnp.asarray(r.rand(n_s).astype(np.float32))
    r1 = jnp.asarray(r.rand(n_s).astype(np.float32))
    lot = jnp.asarray(r.rand(n_s).astype(np.float32))
    s = bxdf_sample(p, wo, n, r0, r1, lot, jnp.float32(1.0))
    wi = s.wi
    ok = np.asarray(s.success)
    # half vector between wo(=n) and wi
    h = (wi + wo).normalized(1e-20)
    cos_h = np.asarray(h.z)[ok]
    # success requires wi.n > 0, i.e. cos(h) > 1/sqrt(2) at normal
    # incidence — condition the analytic quadrature identically
    a = max(rough * rough, 1e-3)
    cut = 1.0 / np.sqrt(2.0)
    thetas = np.linspace(1e-4, np.arccos(cut), 4000)
    d = (a * a) / (np.pi * (np.cos(thetas) ** 2 * (a * a - 1) + 1) ** 2)
    w = d * np.cos(thetas) * np.sin(thetas)
    mean_expect = (np.cos(thetas) * w).sum() / w.sum()
    assert (cos_h > cut - 1e-4).all()
    np.testing.assert_allclose(cos_h.mean(), mean_expect, atol=5e-3)


def test_energy_conservation_lambertian():
    """White furnace: integral of f cos over hemisphere <= 1."""
    p = make_params(1, LAMBERTIAN, diffuse=(1.0, 1.0, 1.0))
    n = unit(1, 0, 0, 1)
    wo = unit(1, 0.2, 0.0, 1.0)
    thetas = np.linspace(0, np.pi / 2, 128)
    dt = thetas[1] - thetas[0]
    total = 0.0
    for t in thetas:
        wi = unit(1, np.sin(t), 0, np.cos(t))
        f = float(bxdf_eval(p, wi, wo, n, n, jnp.float32(1.0)).x[0])
        total += f * np.cos(t) * np.sin(t) * dt * 2 * np.pi
    assert total <= 1.01
