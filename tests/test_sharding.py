"""Multi-device sharding: distributed render must equal the single-device
render bit-for-bit (counter-based RNG is shard-invariant), and the sharded
train step must produce finite loss/gradients."""
import jax
import numpy as np
import pytest

from tuturenderer_tpu.grad import get_params
from tuturenderer_tpu.integrators.path import render
from tuturenderer_tpu.options import RenderOptions
from tuturenderer_tpu.parallel.sharding import (make_mesh, render_sharded,
                                                train_step_sharded)
from tuturenderer_tpu.scene.presets import simple_box

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (fake) devices")


def test_sharded_render_matches_single_device():
    scene, cam = simple_box(32, 32)
    opts = RenderOptions(spp=4, max_depth=3)
    mesh = make_mesh(8)
    assert mesh.shape["tile"] * mesh.shape["sample"] == 8
    img1 = np.asarray(render(scene, cam, opts, seed=5))
    img8 = np.asarray(render_sharded(scene, cam, opts, mesh, seed=5))
    np.testing.assert_allclose(img8, img1, rtol=2e-5, atol=2e-6)


def test_sharded_train_step():
    scene, cam = simple_box(16, 16)
    opts = RenderOptions(spp=2, max_depth=2)
    mesh = make_mesh(8)
    params = get_params(scene)
    target = np.zeros((16, 16, 3), np.float32)
    new_params, loss = jax.block_until_ready(
        train_step_sharded(params, target, scene, cam, opts, mesh, lr=1e-3))
    assert np.isfinite(float(loss)) and float(loss) > 0
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params, new_params)
    assert max(jax.tree.leaves(moved)) > 0  # the update did something
