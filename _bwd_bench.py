import time, json
import jax, numpy as np
from tuturenderer_tpu.grad import get_params, image_loss_and_grad
from tuturenderer_tpu.options import RenderOptions
from tuturenderer_tpu.scene.presets import cornell_box

W = H = 512
spp = 16
scene, cam = cornell_box(width=W, height=H)
opts = RenderOptions(spp=spp, max_depth=6)
params = get_params(scene)
target = np.zeros((H, W, 3), np.float32)
# compile
out = jax.block_until_ready(image_loss_and_grad(params, target, scene, cam, opts, 0))
t0 = time.time()
out = jax.block_until_ready(image_loss_and_grad(params, target, scene, cam, opts, 1))
dt = time.time() - t0
CORNELL_ALIVE = (1.0, 0.854, 0.608, 0.489, 0.399, 0.337, 0.186)
rays = W*H*spp*(2.0*sum(CORNELL_ALIVE)+0.098)
print(json.dumps({"fwdbwd_rays_per_sec": rays/dt, "wall_s": dt,
                  "loss": float(out[0])}))
