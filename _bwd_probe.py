import time, json, dataclasses
import jax, jax.numpy as jnp, numpy as np
from tuturenderer_tpu.grad import get_params, put_params, render_diff, MaterialParams
from tuturenderer_tpu.options import RenderOptions
from tuturenderer_tpu.scene.presets import cornell_box
from tuturenderer_tpu.integrators.path import render, render_sample

W = H = 512; spp = 16
scene, cam = cornell_box(width=W, height=H)
opts = RenderOptions(spp=spp, max_depth=6)
params = get_params(scene)

def timeit(name, f):
    jax.block_until_ready(f())          # compile
    t0 = time.time(); jax.block_until_ready(f()); dt = time.time() - t0
    print(json.dumps({"name": name, "wall_s": round(dt, 4)}), flush=True)

# 1. plain tuned forward renderer
timeit("fwd_render", lambda: render(scene, cam, opts, 1))
# 2. render_diff forward value only (same graph as grad fwd, no AD)
rd = jax.jit(lambda p: render_diff(p, scene, cam, opts, 1))
timeit("fwd_render_diff", lambda: rd(params))
# 3. full grad
g = jax.jit(jax.grad(lambda p: jnp.mean(render_diff(p, scene, cam, opts, 1)**2)))
timeit("grad_full", lambda: g(params))
# 4. grad without per-sample checkpoint: inline one-sample render, spp=4
opts4 = dataclasses.replace(opts, spp=4, differentiable=True)
def render_nockpt(p):
    sc = put_params(scene, p)
    lane = jnp.arange(cam.n_pixels, dtype=jnp.int32)
    px = lane % cam.width; py = lane // cam.width
    acc = jnp.zeros((cam.n_pixels,))
    for s in range(4):
        L = render_sample(sc, cam, px, py, lane, s, 1, opts4)
        acc = acc + L.x + L.y + L.z
    return jnp.mean((acc / 4)**2)
g2 = jax.jit(jax.grad(render_nockpt))
timeit("grad_nockpt_spp4", lambda: g2(params))
g3 = jax.jit(jax.grad(lambda p: jnp.mean(render_diff(p, scene, cam, dataclasses.replace(opts, spp=4), 1)**2)))
timeit("grad_ckpt_spp4", lambda: g3(params))
