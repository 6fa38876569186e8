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

    Uses lax.scan over samples with rematerialization so the backward pass
    replays each sample's path instead of storing it (the path-replay
    backward pass: memory O(1) in spp).
    """
    opts = dataclasses.replace(opts, differentiable=True)
    scene = put_params(scene, params)
    p = cam.n_pixels
    lane = jnp.arange(p, dtype=jnp.int32)
    px = lane % cam.width
    py = lane // cam.width

    @jax.checkpoint
    def one_sample(s):
        return render_sample(scene, cam, px, py, lane, s, seed, opts)

    def body(acc, s):
        L = one_sample(s)
        return (acc[0] + L.x, acc[1] + L.y, acc[2] + L.z), None

    zeros = jnp.zeros((p,), jnp.float32)
    acc, _ = jax.lax.scan(body, (zeros, zeros, zeros),
                          jnp.arange(opts.spp, dtype=jnp.int32))
    inv = 1.0 / opts.spp
    img = jnp.stack([acc[0] * inv, acc[1] * inv, acc[2] * inv], axis=-1)
    return img.reshape(cam.height, cam.width, 3)


@partial(jax.jit, static_argnames=("opts",))
def image_loss_and_grad(params: MaterialParams, target, scene: SceneData,
                        cam: Camera, opts: RenderOptions, seed=0):
    """L2 image loss against ``target`` and its gradient w.r.t. params —
    the core op of inverse-rendering / appearance-optimization loops."""

    def loss_fn(p):
        img = render_diff(p, scene, cam, opts, seed)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(params)
