import numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
G, N = 32, 9600
table = rng.uniform(0, 640, (G, 4)).astype(np.float32)
idx = rng.integers(0, G, (N,)).astype(np.int32)

@jax.jit
def sel_matmul(idx, table):
    sel = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    return jax.lax.dot(sel, table, precision=jax.lax.Precision.HIGHEST)

@jax.jit
def sel_default(idx, table):
    sel = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    return sel @ table

out_h = jax.device_get(sel_matmul(idx, table))
out_d = jax.device_get(sel_default(idx, table))
ref = table[idx]
print("HIGHEST exact:", np.array_equal(out_h, ref), "max diff", np.abs(out_h - ref).max())
print("DEFAULT exact:", np.array_equal(out_d, ref), "max diff", np.abs(out_d - ref).max())
