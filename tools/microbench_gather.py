"""Microbenchmark gather strategies on the axon TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

B, K, R, M, N, H = 16, 50, 16, 100, 128, 65
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.standard_normal((B, K, R, N)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, (B, K, R, M)), jnp.int32)
idxH = jnp.asarray(rng.integers(0, N, (B, H, K, R, M)), jnp.int32)
small = jnp.asarray(rng.standard_normal(64), jnp.float32)
idxS = jnp.asarray(rng.integers(0, 64, (B, H, K, R, M)), jnp.int32)

def t(f, *a, n=10, warm=2):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(g(*a))
    return (time.perf_counter() - t0) / n * 1e3

# 1. take_along_axis [B,K,R,M] from [B,K,R,N]
print("small TAA        %8.2f ms" % t(lambda T, I: jnp.take_along_axis(T, I, axis=-1), tab, idx))

# 2. one-hot matmul same gather
def oh_mm(T, I):
    oh = (I[..., None] == jnp.arange(N, dtype=jnp.int32)).astype(jnp.float32)
    return jnp.einsum('bkrmn,bkrn->bkrm', oh, T)
print("small onehot mm  %8.2f ms" % t(oh_mm, tab, idx))

# 3. big diag gather [B,H,K,R,M] from [B,K,R,N]
def big_taa(T, I):
    Tb = jnp.broadcast_to(T[:, None], (B, H, K, R, N))
    return jnp.take_along_axis(Tb, I, axis=-1)
print("big TAA          %8.2f ms" % t(big_taa, tab, idxH, n=3))

def big_oh(T, I):
    oh = (I[..., None] == jnp.arange(N, dtype=jnp.int32)).astype(jnp.float32)
    return jnp.einsum('bhkrmn,bkrn->bhkrm', oh, T)
print("big onehot mm    %8.2f ms" % t(big_oh, tab, idxH, n=3))

# 5. flat small-table gather [B,H,K,R,M] from [64]
print("64-tab gather    %8.2f ms" % t(lambda s, I: s[I], small, idxS, n=3))

def small_oh(s, I):
    oh = (I[..., None] == jnp.arange(64, dtype=jnp.int32)).astype(jnp.float32)
    return oh @ s
print("64-tab onehot    %8.2f ms" % t(small_oh, small, idxS, n=3))

# 6. elementwise baseline on [B,H,K,R,M]
x = jnp.asarray(rng.standard_normal((B, H, K, R, M)), jnp.float32)
print("elementwise x*x+x%8.2f ms" % t(lambda a: a * a + a, x, n=10))

# 7. while_loop of 65 dynamic slices + elementwise on [B,H,K,R,M]
def loop_scan(a):
    def body(i, acc):
        return acc * 0.5 + jax.lax.dynamic_index_in_dim(a, i, axis=1, keepdims=False)
    return jax.lax.fori_loop(0, H, body, jnp.zeros((B, K, R, M), jnp.float32))
print("fori 65 slices   %8.2f ms" % t(loop_scan, x, n=5))

# 8. same but H-major layout [H,B,K,R,M]
xh = jnp.moveaxis(x, 1, 0)
def loop_scan_h(a):
    def body(i, acc):
        return acc * 0.5 + jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)
    return jax.lax.fori_loop(0, H, body, jnp.zeros((B, K, R, M), jnp.float32))
print("fori H-major     %8.2f ms" % t(loop_scan_h, xh, n=5))
