"""Phase-level profile of one FoldEngine step at the bench config."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import numpy as np
import jax, jax.numpy as jnp

from rafft_tpu.engine import fold_jax as FJ
from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
seqs = []
with open(CORPUS) as fh:
    for row in csv.reader(fh):
        if len(row) >= 3 and len(row[0]) <= 120:
            seqs.append(row[0])
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = EngineConfig(N=128, K=50, R=16, M=100, V=4096, S=16384, max_branch=1000)
eng = FoldEngine(cfg, B=B)

state = eng.init_state(seqs[:B])
# advance two steps so the beam is populated (worst case work)
state = eng._step(state)
state = eng._step(state)
jax.block_until_ready(state["pt"])

def timeit(f, *a, n=5):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n, r

t, _ = timeit(eng._step, state)
print(f"full step           {t*1e3:8.1f} ms")

# phase probes: jit sub-functions vmapped over batch
dp, W, integral = eng.dp, eng.W, eng.integral

def phase_regions(st):
    def one(codes, n, pt, rorder):
        loops = jax.vmap(lambda p: FJ.analyze_pt(dp, codes, p, n))(pt)
        rpos, rloc, rslot, mlen = FJ._regions(cfg, pt, loops["enclose"], rorder, n)
        rcodes = jnp.where(rpos < cfg.N, codes[jnp.clip(rpos, 0, cfg.N - 1)], 0)
        return loops, rpos, rloc, rslot, mlen, rcodes
    return jax.vmap(one)(st["codes"], st["n"], st["pt"], st["rorder"])

p_regions = jax.jit(phase_regions)
t, rg = timeit(p_regions, state)
print(f"analyze+regions     {t*1e3:8.1f} ms")
loops, rpos, rloc, rslot, mlen, rcodes = rg

def phase_cor(rcodes, mlen):
    return jax.vmap(lambda rc, ml: FJ._correlate(cfg, W, rc, ml, integral))(rcodes, mlen)
p_cor = jax.jit(phase_cor)
t, cor = timeit(p_cor, rcodes, mlen)
print(f"correlate           {t*1e3:8.1f} ms")

def phase_top(cor):
    return jax.vmap(lambda c: FJ._top_lags(cfg, c))(cor)
p_top = jax.jit(phase_top)
t, tl = timeit(p_top, cor)
lags, lvals = tl
print(f"top_lags            {t*1e3:8.1f} ms")

lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, :, None] >= 2) & state["active"][:, :, None, None]

def phase_ws(rcodes, rpos, mlen, lags, lag_ok):
    return jax.vmap(lambda rc, rp, ml, lg, lo: FJ._window_scan(
        cfg, dp, W, rc, rp, ml, lg, lo))(rcodes, rpos, mlen, lags, lag_ok)
p_ws = jax.jit(phase_ws)
t, ws = timeit(p_ws, rcodes, rpos, mlen, lags, lag_ok)
print(f"window_scan         {t*1e3:8.1f} ms")

def phase_cd(codes, n, pt, loops, rorder, rpos, mlen, ws, lags):
    def one(codes, n, pt, lp, ror, rp, ml, w, lg):
        keys = (FJ._kmer_keys(codes, 5), FJ._kmer_keys(codes, 6), FJ._kmer_keys(codes, 8))
        return FJ._candidate_delta(cfg, dp, codes, n, keys, pt, lp, ror, rp, ml, w, lg)
    return jax.vmap(one)(codes, n, pt, loops, rorder, rpos, mlen, ws, lags)
p_cd = jax.jit(phase_cd)
t, cd = timeit(p_cd, state["codes"], state["n"], state["pt"], loops,
               state["rorder"], rpos, mlen, ws, lags)
print(f"candidate_delta     {t*1e3:8.1f} ms")

delta, cplx, has, p0, q0, a, b2 = cd
print("gapped/cplx stats: cplx cand per seq:",
      np.asarray((cplx & lag_ok).sum(axis=(1, 2, 3))))
