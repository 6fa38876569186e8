"""Light tracing (particle tracing): paths start at emitters and splat to
the film through the camera projection.

Re-architecture of LightTracing (LightTracing.hpp:25-206). Per sample:
sample a light point and cosine direction (IIntegrator.hpp:173-220), splat
the directly visible light through We (LightTracing.hpp:116-122), then
random-walk with the ADJOINT BSDF (LightTracing.hpp:143-178) and connect
every vertex to the camera with Geo * We and a shadow test
(LightTracing.hpp:181-200).

The reference's mutex-protected single-threaded splats become masked
scatter-adds into the framebuffer (``.at[].add`` with drop mode) — the
pure-functional replacement for ``FrameBuffer.addRGB`` under a lock; under
sharding these become per-shard partial films that are psum-reduced.

The direct light->eye splat uses setRGB (overwrite, LightTracing.hpp:121),
whose result depends on write order when several samples project to the
same pixel with different light points. We replace it with deterministic
channel max-combining (``.at[].max``), which is order- and
shard-invariant; for a single visible sample it equals the overwrite.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera, importance_we, world_to_pixel_index
from ..materials import bxdf_eval, bxdf_pdf, bxdf_sample, gather_material
from ..ops.intersect import intersect_core, occluded, shade_hit
from ..ops.lights import sample_cosine_dir, sample_light
from ..options import EPSILON, MIN_DIVISOR, RenderOptions
from ..utils import rng
from ..utils.vec import Vec3, reflect, where as vwhere
from .path import apply_textures


def _zeros3(n):
    z = jnp.zeros((n,), jnp.float32)
    return Vec3(z, z, z)


def geo_term(p1: Vec3, n1: Vec3, p2: Vec3, n2: Vec3):
    """Geometry term (IIntegrator.hpp:223-230)."""
    v = p2 - p1
    d2 = v.norm2()
    vn = v.normalized(1e-20)
    return jnp.abs(vn.dot(n1)) * jnp.abs((-vn).dot(n2)) / jnp.maximum(d2, 1e-20)


def trace_sample(scene, cam: Camera, lane, sample_idx, seed,
                 opts: RenderOptions):
    """One light path per lane. Returns (splat_idx [n, V], splat_rgb x3
    [n, V]) for V = 1 direct + (lt_max_depth-1) vertex connections."""
    n = lane.shape[0]
    eta_scene = scene.eta
    u = lambda b, p: rng.uniform(seed, lane, sample_idx, b, p)
    # detached-sampling autodiff (opts.differentiable): sampled light
    # points, directions and pdfs are piecewise-constant in the material
    # table; gradients flow through emission, adjoint BSDF values and the
    # We/Geo throughput chain (same treatment as path.py)
    sg = jax.lax.stop_gradient if opts.differentiable else (lambda x: x)

    ls = sample_light(scene, u(0, rng.LIGHT_PICK), u(0, rng.LIGHT_U),
                      u(0, rng.LIGHT_V), opts.tutu_light_pick,
                      opts.tutu_tri_sample)
    ls = ls._replace(pos=sg(ls.pos), ng=sg(ls.ng), pdf_area=sg(ls.pdf_area))
    pick_pdf = ls.pdf_area
    wi, dir_pdf, dir_ok = sample_cosine_dir(
        ls.ng, u(0, rng.LIGHT_DIR_U0), u(0, rng.LIGHT_DIR_U1))
    wi = sg(wi)
    dir_pdf = sg(dir_pdf)
    alive = ls.valid & dir_ok

    # direct light -> eye splat (LightTracing.hpp:116-122)
    orig0 = ls.pos + ls.ng * EPSILON
    to_cam = cam.position - orig0
    cam_dist = to_cam.norm()
    vis = ~occluded(scene, orig0, to_cam * (1.0 / jnp.maximum(cam_dist, 1e-20)),
                    cam_dist, mask=ls.valid)
    we0, idx0 = importance_we(cam, ls.pos)
    direct_rgb = ls.emission * we0
    direct_idx = jnp.where(ls.valid & vis & (idx0 >= 0), idx0, -1)

    # walk state: tp at NEXT vertex = (1/pickpdf) * cos / dirPdf
    cos0 = jnp.abs(wi.dot(ls.ng))
    tp = Vec3(*(3 * [cos0 / jnp.maximum(pick_pdf * dir_pdf, 1e-20)]))
    state = dict(o=orig0, d=wi, tp=tp, alive=alive)

    idx_list = [direct_idx]
    rgb_list = [direct_rgb]

    for s in range(1, max(opts.lt_max_depth, 2)):
        o, d = state['o'], state['d']
        alive = state['alive']
        core = intersect_core(scene, o, d, mask=alive)
        hit = shade_hit(scene, o, d, core)
        params = gather_material(scene, hit.mat)
        params, ns = apply_textures(scene, hit, params)
        hit = hit._replace(ns=ns)
        alive = alive & hit.hit

        wo = -d
        tp = state['tp']

        # per-vertex camera connection (LightTracing.hpp:181-200)
        g = geo_term(cam.position, cam.fwd, hit.pos, hit.ng)
        wi_c = (cam.position - hit.pos).normalized(1e-20)
        f_c = bxdf_eval(params, wi_c, wo, hit.ng, hit.ns,
                        jnp.float32(1.0), adjoint=True,
                        types=scene.mtype_set)
        we, idx = importance_we(cam, hit.pos)
        contrib = ls.emission * f_c * tp * (g * we)
        inside_c = hit.ns.dot(wo) < 0.0
        oc = hit.pos + vwhere(inside_c, -hit.ns, hit.ns) * EPSILON
        toc = cam.position - oc
        dc = toc.norm()
        viso = ~occluded(scene, oc, toc * (1.0 / jnp.maximum(dc, 1e-20)), dc,
                         mask=alive & (idx >= 0))
        ok = alive & viso & (idx >= 0)
        idx_list.append(jnp.where(ok, idx, -1))
        rgb_list.append(contrib)

        # sample continuation with adjoint BSDF (LightTracing.hpp:152-178)
        samp = bxdf_sample(params, wo, hit.ns, u(s, rng.BSDF_U0),
                           u(s, rng.BSDF_U1), u(s, rng.BSDF_LOTTERY),
                           eta_scene, opts.ggx_sample_bug,
                           types=scene.mtype_set)
        nwi = sg(samp.wi)
        pdf = sg(bxdf_pdf(params, nwi, wo, hit.ns, eta_scene, params.eta,
                          types=scene.mtype_set))
        tir = samp.tir
        nwi = vwhere(tir, reflect(wo, hit.ns).normalized(1e-20), nwi)
        pdf = jnp.where(tir, 1.0, pdf)
        alive = alive & samp.success & (pdf != 0.0) & (pdf >= MIN_DIVISOR)
        cos = jnp.abs(nwi.dot(hit.ng))
        f = bxdf_eval(params, nwi, wo, hit.ng, hit.ns, eta_scene,
                      adjoint=True, tir=tir, types=scene.mtype_set)
        tp = tp * f * (cos / jnp.maximum(pdf, 1e-20))

        inside = hit.ns.dot(nwi) < 0.0
        o2 = hit.pos + vwhere(inside, -hit.ns, hit.ns) * EPSILON
        state = dict(o=o2, d=nwi, tp=tp, alive=alive)

    return idx_list, rgb_list, direct_idx, direct_rgb


@partial(jax.jit, static_argnames=("opts",))
def raster_check(scene, cam: Camera, opts: RenderOptions, seed=0):
    """CHECK_LT-equivalent debug pass (LightTracing.hpp:5, 28-93): trace a
    primary ray per pixel, project the hit point back through the camera's
    world->raster chain, and splat the surface albedo at the PROJECTED
    pixel. If ``worldPos2PixelIndex`` is consistent with ray generation,
    the output is a flat-shaded image of the scene in place; any
    projection error shows up as smearing/displacement. Returns the debug
    image [H, W, 3]."""
    p = cam.n_pixels
    lane = jnp.arange(p, dtype=jnp.int32)
    px = lane % cam.width
    py = lane // cam.width
    from ..camera import primary_ray
    o, d, _ = primary_ray(cam, px, py)
    core = intersect_core(scene, o, d)
    hit = shade_hit(scene, o, d, core)
    params = gather_material(scene, hit.mat)
    idx = world_to_pixel_index(cam, hit.pos)
    ok = hit.hit & (idx >= 0)
    vidx = jnp.where(ok, idx, p)
    color = vwhere(params.emissive, params.emission, params.diffuse)
    bkg = scene.bkgcolor
    fr = jnp.full((p,), bkg.x).at[vidx].set(
        jnp.where(ok, color.x, 0.0), mode='drop')
    fg = jnp.full((p,), bkg.y).at[vidx].set(
        jnp.where(ok, color.y, 0.0), mode='drop')
    fb = jnp.full((p,), bkg.z).at[vidx].set(
        jnp.where(ok, color.z, 0.0), mode='drop')
    img = jnp.stack([fr, fg, fb], axis=-1)
    return img.reshape(cam.height, cam.width, 3)


def raster_roundtrip_error(scene, cam: Camera):
    """Fraction of hit pixels whose hit point projects back to a DIFFERENT
    pixel index — the quantitative form of the CHECK_LT eyeball test.
    Should be ~0 for a consistent camera (boundary pixels may round across
    an edge)."""
    p = cam.n_pixels
    lane = jnp.arange(p, dtype=jnp.int32)
    px = lane % cam.width
    py = lane // cam.width
    from ..camera import primary_ray
    o, d, _ = primary_ray(cam, px, py)
    core = intersect_core(scene, o, d)
    hit = shade_hit(scene, o, d, core)
    idx = world_to_pixel_index(cam, hit.pos)
    mism = hit.hit & (idx != lane)
    n_hit = jnp.maximum(jnp.sum(hit.hit), 1)
    return jnp.sum(mism) / n_hit


@partial(jax.jit, static_argnames=("opts", "return_parts"))
def render(scene, cam: Camera, opts: RenderOptions, seed=0, sample_base=0,
           return_parts: bool = False):
    """``sample_base`` shifts the global sample indices (counter-based RNG)
    so chunked/progressive renders continue the exact stream.
    ``return_parts=True`` returns the raw accumulators
    (splat_sum [H,W,3], direct_max_unscaled [H,W,3], dmask [H,W]) instead
    of the composed image, so a progressive driver can max-combine direct
    splats and sum connection splats across chunks exactly."""
    p = cam.n_pixels
    lane = jnp.arange(p, dtype=jnp.int32)

    def body(s, carry):
        fr, fg, fb, dr, dg, db, dmask = carry
        idx_list, rgb_list, didx, drgb = trace_sample(
            scene, cam, lane, sample_base + s, seed, opts)
        # direct visible-light splat: the reference's setRGB overwrite is
        # write-order-arbitrary when samples hit the same pixel with
        # different light points (LightTracing.hpp:121); we use channel
        # max-combining instead — deterministic and shard-invariant.
        # The max is over the RAW per-sample value; the reference's
        # SPP_inv scale (LightTracing.hpp:121) is applied at composition.
        vdid = jnp.where(didx >= 0, didx, p)
        dr = dr.at[vdid].max(drgb.x, mode='drop')
        dg = dg.at[vdid].max(drgb.y, mode='drop')
        db = db.at[vdid].max(drgb.z, mode='drop')
        dmask = dmask.at[vdid].set(True, mode='drop')
        # vertex-connection splats: addRGB accumulate (raw sums)
        for i, (idx, rgb) in enumerate(zip(idx_list, rgb_list)):
            if i == 0:
                continue
            vidx = jnp.where(idx >= 0, idx, p)
            fr = fr.at[vidx].add(rgb.x, mode='drop')
            fg = fg.at[vidx].add(rgb.y, mode='drop')
            fb = fb.at[vidx].add(rgb.z, mode='drop')
        return fr, fg, fb, dr, dg, db, dmask

    zeros = jnp.zeros((p,), jnp.float32)
    fmask = jnp.zeros((p,), bool)
    fr, fg, fb, dr, dg, db, dmask = jax.lax.fori_loop(
        0, opts.spp, body, (zeros, zeros, zeros, zeros, zeros, zeros, fmask))
    hw = (cam.height, cam.width)
    if return_parts:
        splat = jnp.stack([fr, fg, fb], axis=-1).reshape(*hw, 3)
        direct = jnp.stack([dr, dg, db], axis=-1).reshape(*hw, 3)
        return splat, direct, dmask.reshape(*hw)
    return compose_light_film(
        scene, cam,
        jnp.stack([fr, fg, fb], axis=-1).reshape(*hw, 3),
        jnp.stack([dr, dg, db], axis=-1).reshape(*hw, 3),
        dmask.reshape(*hw), opts.spp)


def compose_light_film(scene, cam: Camera, splat_sum, direct_max, dmask,
                       total_spp):
    """Compose the light-tracing film from raw accumulators: background
    where nothing wrote, SPP_inv-scaled direct overwrite + averaged
    connection splats (LightTracing.hpp:116-122, 181-200)."""
    spp_inv = 1.0 / total_spp
    bkg = scene.bkgcolor
    bkg_img = jnp.stack([jnp.zeros_like(dmask, jnp.float32) + bkg.x,
                         jnp.zeros_like(dmask, jnp.float32) + bkg.y,
                         jnp.zeros_like(dmask, jnp.float32) + bkg.z],
                        axis=-1)
    img = jnp.where(dmask[..., None], direct_max * spp_inv, bkg_img) + \
        splat_sum * spp_inv
    return jnp.where(jnp.isnan(img), 0.0, img)
