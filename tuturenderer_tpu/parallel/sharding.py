"""Multi-chip scaling: pixel-tile x sample data parallelism over a device
mesh, with replicated scene and all-reduced film/gradients.

The reference's only parallel layer is std::thread row slicing on one CPU
(PathTracing.hpp:393-430, N_THREAD=20). The TPU design shards the
embarrassing axes over a 2D ``jax.sharding.Mesh``:

- axis ``tile``: the flat pixel/lane axis (the analogue of row bands);
- axis ``sample``: spp groups (each device traces spp/n_sample samples of
  its pixel slice and the partial films are ``psum``-reduced over ICI).

Scene/BVH/material/texture buffers are replicated per chip (they are
small); the wavefront state lives entirely in the shard. Counter-based
RNG (utils/rng.py) makes results bit-identical for any mesh shape.

Gradients in the training step are ``psum``-reduced over both axes, which
XLA overlaps with the backward sweep.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..camera import Camera
from ..grad import MaterialParams, put_params
from ..integrators.path import render_sample
from ..options import RenderOptions
from ..scene.data import SceneData


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """Factor the device count into a (tile, sample) mesh, favoring the
    tile axis (film partitioning) for the larger factor."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    sample = 1
    for cand in (4, 2):
        if n % cand == 0 and n // cand >= cand:
            sample = cand
            break
    if n % sample:
        sample = 1
    tile = n // sample
    dev_array = np.asarray(devices).reshape(tile, sample)
    return Mesh(dev_array, ("tile", "sample"))


def _padded_lane_count(n_pixels: int, n_tile: int) -> int:
    return ((n_pixels + n_tile - 1) // n_tile) * n_tile


def render_sharded(scene: SceneData, cam: Camera, opts: RenderOptions,
                   mesh: Mesh, seed: int = 0):
    """Full-frame render distributed over ``mesh`` -> [H, W, 3] (replicated).

    Pixels are sharded over 'tile'; each 'sample' row of the mesh traces an
    interleaved subset of spp and partial films are psum-reduced.
    """
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    assert opts.spp % n_sample == 0, \
        f"spp={opts.spp} must divide by sample axis {n_sample}"
    spp_local = opts.spp // n_sample

    p = cam.n_pixels
    p_pad = _padded_lane_count(p, n_tile)
    lane = jnp.arange(p_pad, dtype=jnp.int32)

    def shard_fn(lane_shard):
        sample_id = jax.lax.axis_index("sample")
        px = lane_shard % cam.width
        py = jnp.minimum(lane_shard // cam.width, cam.height - 1)

        def body(s, acc):
            # global sample index: interleaved over the sample axis
            gs = s * n_sample + sample_id
            L = render_sample(scene, cam, px, py, lane_shard, gs, seed, opts)
            return (acc[0] + L.x, acc[1] + L.y, acc[2] + L.z)

        zeros = jnp.zeros_like(lane_shard, dtype=jnp.float32)
        acc = jax.lax.fori_loop(0, spp_local, body, (zeros, zeros, zeros))
        inv = 1.0 / opts.spp
        film = jnp.stack([a * inv for a in acc], axis=-1)
        return jax.lax.psum(film, "sample")

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=P("tile"),
                   out_specs=P("tile", None), check_vma=False)
    film = fn(lane)[:p]
    return film.reshape(cam.height, cam.width, 3)


def train_step_sharded(params: MaterialParams, target, scene: SceneData,
                       cam: Camera, opts: RenderOptions, mesh: Mesh,
                       lr: float = 0.01, seed: int = 0):
    """One inverse-rendering SGD step distributed over ``mesh``: each shard
    renders its pixel/sample slice differentiably, computes its partial L2
    loss against ``target``, and gradients are psum-reduced over both mesh
    axes before the update. Returns (new_params, loss)."""
    opts = dataclasses.replace(opts, differentiable=True)
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    spp_local = max(opts.spp // n_sample, 1)

    p = cam.n_pixels
    p_pad = _padded_lane_count(p, n_tile)
    lane = jnp.arange(p_pad, dtype=jnp.int32)
    tgt = jnp.asarray(target, jnp.float32).reshape(-1, 3)
    if p_pad != p:
        tgt = jnp.concatenate(
            [tgt, jnp.zeros((p_pad - p, 3), jnp.float32)], axis=0)

    def shard_fn(prm, lane_shard, tgt_shard):
        sample_id = jax.lax.axis_index("sample")
        px = lane_shard % cam.width
        py = jnp.minimum(lane_shard // cam.width, cam.height - 1)
        sc = put_params(scene, prm)

        def loss_fn(prm_inner):
            sc_i = put_params(scene, prm_inner)

            def body(acc, s):
                gs = s * n_sample + sample_id
                L = render_sample(sc_i, cam, px, py, lane_shard, gs, seed, opts)
                return (acc[0] + L.x, acc[1] + L.y, acc[2] + L.z), None

            zeros = jnp.zeros_like(lane_shard, dtype=jnp.float32)
            acc, _ = jax.lax.scan(
                body, (zeros, zeros, zeros),
                jnp.arange(spp_local, dtype=jnp.int32))
            inv = 1.0 / (spp_local * n_sample)
            film = jnp.stack([a * inv for a in acc], axis=-1)
            film = jax.lax.psum(film, "sample")
            return jnp.sum((film - tgt_shard) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(prm)
        # gradient all-reduce over ICI: both mesh axes
        grads = jax.lax.psum(grads, ("tile", "sample"))
        loss = jax.lax.psum(loss, "tile") / (n_sample * p)
        new_params = jax.tree.map(lambda w, g: w - lr * g, prm, grads)
        return new_params, loss

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P("tile"), P("tile", None)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(params, lane, tgt)
