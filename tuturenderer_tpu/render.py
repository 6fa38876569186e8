"""Renderer orchestration: scene + camera + options -> image.

The analogue of Renderer (Renderer.hpp:32-72): selects the integrator
(path / light / naivept / bdpt, matching integrateType 0-3), runs it, and
hands the linear framebuffer to post-processing / I/O.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from .camera import Camera
from .options import RenderOptions
from .scene.data import SceneData


def render_image(scene: SceneData, cam: Camera, opts: RenderOptions,
                 integrator: str = "path", seed: int = 0,
                 postprocess: bool = False) -> np.ndarray:
    """-> linear float32 [H, W, 3]."""
    if integrator == "path":
        from .integrators.path import render as run
    elif integrator == "light":
        from .integrators.light import render as run
    elif integrator == "naivept":
        from .integrators.naive import render as run
    elif integrator == "bdpt":
        from .integrators.bdpt import render as run
    else:
        raise ValueError(f"unknown integrator {integrator!r}")
    img = np.asarray(jax.block_until_ready(run(scene, cam, opts, seed)))
    if postprocess:
        from .post import bloom_and_tonemap
        img = np.asarray(bloom_and_tonemap(img))
    return img


def render_config(config_path: str, opts: Optional[RenderOptions] = None,
                  seed: int = 0, verbose: bool = True) -> np.ndarray:
    """Full pipeline from a reference-format config file (the equivalent of
    ``./PathTracer config.txt``, README.md:59-62)."""
    from .scene.config import parse_config
    t0 = time.time()
    pc = parse_config(config_path)
    scene = pc.builder.build()
    cam = pc.camera()
    if verbose:
        print(f"scene build: {time.time() - t0:.2f}s  "
              f"(tris={scene.n_tris} spheres={scene.n_spheres} "
              f"lights={scene.n_lights})")
    opts = opts or RenderOptions()
    t0 = time.time()
    img = render_image(scene, cam, opts, integrator=pc.integrator, seed=seed)
    if verbose:
        print(f"render ({pc.integrator}, {opts.spp} spp): "
              f"{time.time() - t0:.2f}s")
    return img
