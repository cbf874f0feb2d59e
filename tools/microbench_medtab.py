"""Microbenchmark lookup strategies for MEDIUM tables (int21: 8000,
int22: 40000 entries) at the fold step's index volume [B,K,R,M].

Strategies:
  gather           flat[idx] (current fallback)
  onehot f32 HIGH  exact one-hot einsum (6-pass f32 dot)
  onehot bf16split value-split: v = hi*256 + lo, both in [-128..255],
                   exactly representable in bf16; one stacked einsum
                   over a [n, 2] value table, recombined in f32.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

B, K, R, M = 16, 50, 16, 100
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 8000, (B, K, R, M)), jnp.int32)


def t(f, *a, n=10):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(g(*a))
    return (time.perf_counter() - t0) / n * 1e3


for n_tab in (1600, 8000, 40000):
    tab_np = rng.integers(-3000, 3000, n_tab).astype(np.int32)
    tab = jnp.asarray(tab_np)
    ix = jnp.minimum(idx, n_tab - 1)

    r_g = np.asarray(jax.jit(lambda T, I: T[I])(tab, ix))

    def oh_f32(T, I):
        oh = (I[..., None] == jnp.arange(n_tab, dtype=jnp.int32)).astype(jnp.float32)
        out = jnp.einsum('...n,n->...', oh, T.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        return out.astype(jnp.int32)

    def oh_split(T, I):
        hi = (T >> 8).astype(jnp.bfloat16)          # [-128, 127+] exact
        lo = (T & 255).astype(jnp.bfloat16)          # [0, 255] exact
        tv = jnp.stack([hi, lo], axis=-1)            # [n, 2]
        oh = (I[..., None] == jnp.arange(n_tab, dtype=jnp.int32)).astype(jnp.bfloat16)
        out = jnp.einsum('...n,nt->...t', oh, tv,
                         preferred_element_type=jnp.float32)
        return (out[..., 0].astype(jnp.int32) * 256
                + out[..., 1].astype(jnp.int32))

    r_s = np.asarray(jax.jit(oh_split)(tab, ix))
    assert (r_s == r_g).all(), f"split mismatch n={n_tab}"
    ms_g = t(lambda T, I: T[I], tab, ix, n=3)
    ms_f = t(oh_f32, tab, ix, n=3) if n_tab <= 8000 else float('nan')
    ms_s = t(oh_split, tab, ix)
    print(f"n={n_tab:6d}  gather {ms_g:8.2f} ms   f32HI {ms_f:8.2f} ms"
          f"   bf16split {ms_s:8.2f} ms")
