"""Naive path tracer: BDPT's s=0 strategy only (no NEE).

Re-architecture of NaivePT (NaivePT.hpp:23-170): an eye random walk whose
contribution is nonzero only when the walk lands on an emitter, in the
measurement-function formulation ("way 2", NaivePT.hpp:92-101): the
camera-vertex throughput is cos/pdf_w with pdf_w the projected pixel pdf,
and the pixel estimate is emission * throughput * We(pixel).

Reference conventions kept: sampling/pdf/BxDF use the GEOMETRIC normal
(NaivePT.hpp:122-134), the walk is capped by the leaked MAXDEPTH=2 macro
(LightTracing.hpp:6 via include order, Renderer.hpp:27-28) exposed as
opts.lt_max_depth, and MIN_DIVISOR gates the walk (NaivePT.hpp:135).
Fixed (not reproduced): the argument bug passing scene eta where the
shading normal belongs (NaivePT.hpp:134) — we pass the real normal.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera, importance_we, primary_ray
from ..materials import bxdf_eval, bxdf_pdf, bxdf_sample, gather_material
from ..ops.intersect import intersect_core, shade_hit
from ..options import EPSILON, MIN_DIVISOR, RenderOptions
from ..utils import rng
from ..utils.vec import Vec3, reflect, where as vwhere
from .path import apply_textures


def _zeros3(n):
    z = jnp.zeros((n,), jnp.float32)
    return Vec3(z, z, z)


def trace_sample(scene, cam: Camera, px, py, lane, sample_idx, seed,
                 opts: RenderOptions) -> Vec3:
    n = px.shape[0]
    o, d, pixel_pos = primary_ray(cam, px, py)
    eta_scene = scene.eta

    # camera-vertex throughput, "way 2" (NaivePT.hpp:92-101)
    wi_n_cos = jnp.abs(d.dot(cam.fwd))
    d2 = (pixel_pos - cam.position).norm2()
    pdf_cam_w = d2 * cam.lens_area_inv * cam.film_area_inv / \
        jnp.maximum(wi_n_cos, 1e-20)
    tp0 = wi_n_cos / pdf_cam_w

    state = dict(
        o=o, d=d,
        tp=Vec3(tp0, tp0, tp0),
        alive=jnp.ones((n,), bool),
        emission=_zeros3(n),
        em_tp=_zeros3(n),
    )

    def step(state, t):
        u = lambda purpose: rng.uniform(seed, lane, sample_idx, t, purpose)
        alive = state['alive']
        core = intersect_core(scene, state['o'], state['d'],
                              mask=state['alive'])
        hit = shade_hit(scene, state['o'], state['d'], core)
        params = gather_material(scene, hit.mat)
        params, ns = apply_textures(scene, hit, params)

        alive = alive & hit.hit
        emissive = params.emissive & alive
        # walk terminates on emitters; record (emission, tp) for the
        # final-vertex contribution (NaivePT.hpp:118-119, 147-164)
        emission = vwhere(emissive, params.emission, state['emission'])
        em_tp = vwhere(emissive, state['tp'], state['em_tp'])
        alive = alive & ~emissive

        ng = hit.ng
        wo = -state['d']
        samp = bxdf_sample(params, wo, ng, u(rng.BSDF_U0), u(rng.BSDF_U1),
                           u(rng.BSDF_LOTTERY), eta_scene,
                           opts.ggx_sample_bug, types=scene.mtype_set)
        wi = samp.wi
        pdf = bxdf_pdf(params, wi, wo, ng, eta_scene, params.eta, types=scene.mtype_set)
        tir = samp.tir
        wi = vwhere(tir, reflect(wo, ng).normalized(1e-20), wi)
        pdf = jnp.where(tir, 1.0, pdf)
        alive = alive & (samp.success | tir) & (pdf != 0.0) & \
            (pdf >= MIN_DIVISOR)
        cos = jnp.abs(wi.dot(ng))
        f = bxdf_eval(params, wi, wo, ng, ng, eta_scene, tir=tir,
                      types=scene.mtype_set)
        tp = state['tp'] * f * (cos / jnp.maximum(pdf, 1e-20))

        ray_inside = ng.dot(wi) < 0.0
        orig = hit.pos + vwhere(ray_inside, -ng, ng) * EPSILON
        return dict(o=orig, d=wi, tp=tp, alive=alive,
                    emission=emission, em_tp=em_tp), None

    steps = jnp.arange(1, max(opts.lt_max_depth, 2), dtype=jnp.int32)
    state, _ = jax.lax.scan(step, state, steps)

    we, _ = importance_we(cam, pixel_pos)
    return state['emission'] * state['em_tp'] * we


@partial(jax.jit, static_argnames=("opts",))
def render(scene, cam: Camera, opts: RenderOptions, seed=0, sample_base=0):
    """``sample_base`` shifts the global sample indices (counter-based RNG)
    so chunked/progressive renders continue the exact stream."""
    p = cam.n_pixels
    lane = jnp.arange(p, dtype=jnp.int32)
    px = lane % cam.width
    py = lane // cam.width

    def body(s, acc):
        L = trace_sample(scene, cam, px, py, lane, sample_base + s, seed,
                         opts)
        bad = jnp.isnan(L.x) | jnp.isnan(L.y) | jnp.isnan(L.z)
        L = vwhere(bad, _zeros3(p), L)
        return (acc[0] + L.x, acc[1] + L.y, acc[2] + L.z)

    zeros = jnp.zeros((p,), jnp.float32)
    acc = jax.lax.fori_loop(0, opts.spp, body, (zeros, zeros, zeros))
    inv = 1.0 / opts.spp
    img = jnp.stack([acc[0] * inv, acc[1] * inv, acc[2] * inv], axis=-1)
    return img.reshape(cam.height, cam.width, 3)
