import time, json
import jax, jax.numpy as jnp, numpy as np

N, M, B = 262144, 8, 8   # lanes, materials, bounces
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (B, N), 0, M)
table = jnp.ones((M,), jnp.float32)

def loss_gather(t):
    s = 0.
    for b in range(B):
        s = s + jnp.sum(t[idx[b]] * (b + 1.0))
    return s

def loss_onehot(t):
    s = 0.
    for b in range(B):
        oh = jax.nn.one_hot(idx[b], M, dtype=jnp.float32)  # [N,M]
        s = s + jnp.sum((oh @ t) * (b + 1.0))
    return s

for name, f in [("gather", loss_gather), ("onehot", loss_onehot)]:
    g = jax.jit(jax.grad(f))
    jax.block_until_ready(g(table))
    t0 = time.time(); jax.block_until_ready(g(table)); dt = time.time()-t0
    print(json.dumps({"name": name, "wall_s": round(dt, 5)}), flush=True)
