"""Micro-bench: K independent column gathers vs one packed row gather,
at wavefront scale (4.2M indices), for small tables (materials/lights)
and large tables (compaction self-gather). Also scatter-add (film flush)
column vs packed."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 4_194_304
K = 16


def timed(name, f, *a, reps=3):
    jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(f(*a))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms")
    return out


key = jax.random.PRNGKey(0)

for tab in (8, 2048, N):
    cols = [jax.random.normal(jax.random.fold_in(key, i), (tab,))
            for i in range(K)]
    packed = jnp.stack(cols, axis=1)          # [tab, K]
    idx = jax.random.randint(jax.random.fold_in(key, 99), (N,), 0, tab)

    @jax.jit
    def g_cols(idx, *cs):
        return sum(c[idx] for c in cs)

    @jax.jit
    def g_rows(idx, p):
        return p[idx].sum(axis=1)

    print(f"-- table size {tab}, {K} columns, {N} indices")
    timed("  column gathers", g_cols, idx, *cols)
    timed("  packed row gather", g_rows, idx, packed)

# scatter-add: film flush shape
film_idx = jax.random.randint(jax.random.fold_in(key, 7), (N,), 0, N)
vals = [jax.random.normal(jax.random.fold_in(key, 50 + i), (N,))
        for i in range(3)]
pvals = jnp.stack(vals, axis=1)

@jax.jit
def s_cols(idx, a, b, c):
    z = jnp.zeros((N,))
    return (z.at[idx].add(a, mode='drop'), z.at[idx].add(b, mode='drop'),
            z.at[idx].add(c, mode='drop'))

@jax.jit
def s_rows(idx, p):
    return jnp.zeros((N, 4)).at[idx, :3].add(p, mode='drop')

print(f"-- scatter-add {N} rows x 3")
timed("  column scatters", s_cols, film_idx, *vals)
timed("  packed row scatter", s_rows, film_idx, pvals)

# argsort cost reference
keys32 = jax.random.randint(key, (N,), 0, 1 << 30)
timed("argsort 4.2M i32", jax.jit(jnp.argsort), keys32)
