"""Command-line entry point.

Usage: ``python -m tuturenderer_tpu <config.txt> [options]`` — the
equivalent of the reference's ``./PathTracing.exe config.txt``
(README.md:59-62), with the compile-time #define knobs exposed as flags.
Output defaults to ``<config>.ppm`` next to the input like
PPMGenerator::generate (PPMGenerator.hpp:140-160), plus an optional PNG.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="tuturenderer_tpu",
        description="TPU-native differentiable path tracer")
    ap.add_argument("config", help="scene config file (reference grammar)")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--integrator", default=None,
                    help="override config integrator (path/light/naivept/bdpt)")
    ap.add_argument("--no-mis", action="store_true")
    ap.add_argument("--jitter", action="store_true",
                    help="enable sub-pixel jitter (reference has none)")
    ap.add_argument("--gamma", type=float, default=0.78)
    ap.add_argument("--post", action="store_true",
                    help="bloom + exposure tone-mapping post pass")
    ap.add_argument("-o", "--output", default=None,
                    help="output path (.ppm or .png); default <config>.ppm")
    args = ap.parse_args(argv)

    from .options import RenderOptions
    from .render import render_image
    from .scene.config import parse_config
    from .io.ppm import write_png, write_ppm

    opts = RenderOptions(spp=args.spp, max_depth=args.max_depth,
                         mis=not args.no_mis, jitter=args.jitter,
                         gamma=args.gamma)
    pc = parse_config(args.config)
    scene = pc.builder.build()
    cam = pc.camera()
    integrator = args.integrator or pc.integrator
    img = render_image(scene, cam, opts, integrator=integrator,
                       seed=args.seed, postprocess=args.post)

    out = args.output
    if out is None:
        base = args.config[:-4] if args.config.endswith(".txt") else args.config
        out = base + ".ppm"
    if out.endswith(".png"):
        write_png(out, img, args.gamma)
    else:
        write_ppm(out, img, args.gamma)
    print(f"Generating image successfully: {out}")


if __name__ == "__main__":
    main()
