"""Differentiable rendering: gradients of the image w.r.t. material
parameters (albedo / roughness / metallic / emission).

A capability the reference does not have (it is a pure forward renderer);
required by the project north star. The estimator in integrators/path.py
supports detached-sampling autodiff (opts.differentiable=True): sampled
directions, pdfs, Russian-roulette probabilities and MIS weights are
treated as piecewise-constant, so reverse-mode AD through the bounce scan
yields the standard detached path-replay gradient — exact for parameters
the sampler does not importance-sample (albedo, emission; also roughness/
metallic under the NEE-only estimator and metallic under full MIS, all
FD-validated in tests/test_grad.py) and a low-bias estimate for roughness
under full MIS (the GGX half-vector sampler consumes roughness; measured
bias below MC noise at 16 seeds x 16 spp — see tests/test_grad.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import Camera
from .integrators.path import render_sample
from .options import RenderOptions
from .scene.data import SceneData
from .utils.vec import Vec3


class MaterialParams(NamedTuple):
    """The differentiable subset of the material table."""
    diffuse: Vec3
    emission: Vec3
    roughness: jnp.ndarray
    metallic: jnp.ndarray


def get_params(scene: SceneData) -> MaterialParams:
    m = scene.materials
    return MaterialParams(diffuse=m.diffuse, emission=m.emission,
                          roughness=m.roughness, metallic=m.metallic)


def put_params(scene: SceneData, p: MaterialParams) -> SceneData:
    m = dataclasses.replace(scene.materials, diffuse=p.diffuse,
                            emission=p.emission, roughness=p.roughness,
                            metallic=p.metallic)
    return dataclasses.replace(scene, materials=m)


def render_diff(params: MaterialParams, scene: SceneData, cam: Camera,
                opts: RenderOptions, seed=0):
    """Differentiable full-frame render -> [H, W, 3].

    Uses lax.scan over sample batches with rematerialization so the
    backward pass replays each batch's paths instead of storing them (the
    path-replay backward pass: memory O(1) in spp).

    Honors ``opts.samples_per_launch`` and emits lanes in the same 32x32
    screen-block order as the forward renderer: the cluster intersector's
    beam culling feeds on wide coherent wavefronts, and at small frames a
    one-sample launch leaves the kernels dispatch-bound (the round-4
    sphere fwd+bwd bench ran 65k-lane launches — most of its 5.6x
    fwd->fwd+bwd drop was launch shape, not backward cost). The RNG
    stream is keyed by (pixel, sample), so the result is identical to
    the one-sample-at-a-time schedule."""
    import numpy as _np

    from .integrators.path import _block_order

    opts = dataclasses.replace(opts, differentiable=True)
    scene = put_params(scene, params)
    p = cam.n_pixels
    order_np = _block_order(cam.width, cam.height)
    inv_order = jnp.asarray(_np.argsort(order_np).astype(_np.int32))
    sb = max(1, min(opts.samples_per_launch or 1, opts.spp))
    while opts.spp % sb:
        sb -= 1
    pix = jnp.tile(jnp.asarray(order_np), sb)
    px = pix % cam.width
    py = pix // cam.width
    soff = jnp.repeat(jnp.arange(sb, dtype=jnp.int32), p)

    @jax.checkpoint
    def one_batch(s):
        L = render_sample(scene, cam, px, py, pix, s * sb + soff, seed,
                          opts)
        return (L.x.reshape(sb, p).sum(0), L.y.reshape(sb, p).sum(0),
                L.z.reshape(sb, p).sum(0))

    def body(acc, s):
        L = one_batch(s)
        return (acc[0] + L[0], acc[1] + L[1], acc[2] + L[2]), None

    zeros = jnp.zeros((p,), jnp.float32)
    acc, _ = jax.lax.scan(body, (zeros, zeros, zeros),
                          jnp.arange(opts.spp // sb, dtype=jnp.int32))
    inv = 1.0 / opts.spp
    img = jnp.stack([acc[0] * inv, acc[1] * inv, acc[2] * inv], axis=-1)
    return img[inv_order].reshape(cam.height, cam.width, 3)


@partial(jax.jit, static_argnames=("opts",))
def image_loss_and_grad(params: MaterialParams, target, scene: SceneData,
                        cam: Camera, opts: RenderOptions, seed=0):
    """L2 image loss against ``target`` and its gradient w.r.t. params —
    the core op of inverse-rendering / appearance-optimization loops."""

    def loss_fn(p):
        img = render_diff(p, scene, cam, opts, seed)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(params)
