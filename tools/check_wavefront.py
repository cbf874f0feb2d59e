"""Verify the wavefront pallas kernel against the JAX window_scan path.

Runs on the real TPU: feeds both paths the same (rcodes, rpos, mlen)
from live engine state across several fold steps and asserts identical
cor / top-lags / max_i / max_j / max_nb / best_sE at every selected lag.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import numpy as np
import jax, jax.numpy as jnp

from rafft_tpu.engine import fold_jax as FJ
from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig
from rafft_tpu.engine.wavefront import wavefront_tables
from rafft_tpu.engine.lookup import batched_taa

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
seqs = []
with open(CORPUS) as fh:
    for row in csv.reader(fh):
        if len(row) >= 3 and len(row[0]) <= 120:
            seqs.append(row[0])
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = EngineConfig(N=128, K=50, R=16, M=100, V=4096, S=16384, max_branch=1000)
eng = FoldEngine(cfg, B=B)
dp, W = eng.dp, eng.W
N = cfg.N


def phase_inputs(st):
    def one(codes, n, pt, rorder):
        loops = jax.vmap(lambda p: FJ.analyze_pt(dp, codes, p, n))(pt)
        rpos, rloc, rslot, mlen = FJ._regions(cfg, pt, loops["enclose"],
                                              rorder, n)
        rcodes = jnp.where(rpos < cfg.N, codes[jnp.clip(rpos, 0, cfg.N - 1)], 0)
        return rcodes, rpos, mlen
    return jax.vmap(one)(st["codes"], st["n"], st["pt"], st["rorder"])


p_inputs = jax.jit(phase_inputs)


def jax_path(rcodes, rpos, mlen, active):
    def one(rcodes, rpos, mlen, act):
        cor = FJ._correlate(cfg, W, rcodes, mlen, eng.integral)
        lags, lvals = FJ._top_lags(cfg, cor)
        lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, None] >= 2) \
            & act[:, None, None]
        ws = FJ._window_scan(cfg, dp, W, rcodes, rpos, mlen, lags, lag_ok)
        return cor, lags, lag_ok, ws
    return jax.vmap(one)(rcodes, rpos, mlen, active)


def pallas_path(rcodes, rpos, mlen, active):
    def one(rcodes, rpos, mlen, act):
        tabs = wavefront_tables(cfg, dp, W, rcodes, rpos, mlen)
        lag = jnp.arange(2 * N - 1, dtype=jnp.int32)
        m = mlen[..., None]
        norm = (jnp.minimum(lag, jnp.maximum(2 * m - 2 - lag, 0))
                + jnp.float32(1.0))
        valid = lag < 2 * m - 1
        cor = jnp.where(valid, tabs["cor_raw"][..., : 2 * N - 1] / norm,
                        FJ.NEG)
        lags, lvals = FJ._top_lags(cfg, cor)
        lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, None] >= 2) \
            & act[:, None, None]
        ws = {k: batched_taa(tabs[t], lags)
              for k, t in (("max_nb", "max_nb"), ("max_i", "max_i"),
                           ("max_j", "max_j"), ("best_sE", "best_sE"))}
        return cor, lags, lag_ok, ws
    return jax.vmap(one)(rcodes, rpos, mlen, active)


pj = jax.jit(jax_path)
pp = jax.jit(pallas_path)

state = eng.init_state(seqs[:B])
ok = True
for step in range(6):
    rcodes, rpos, mlen = p_inputs(state)
    act = state["active"]
    c1, l1, lo1, ws1 = jax.block_until_ready(pj(rcodes, rpos, mlen, act))
    c2, l2, lo2, ws2 = jax.block_until_ready(pp(rcodes, rpos, mlen, act))
    c1, c2 = np.asarray(c1), np.asarray(c2)
    same_cor = np.array_equal(c1, c2)
    same_lags = np.array_equal(np.asarray(l1), np.asarray(l2))
    msgs = [f"step {step}: cor={same_cor} lags={same_lags}"]
    lo = np.asarray(lo1)
    have = np.asarray(ws1["max_nb"]) > 0
    mask = lo & have
    for k in ("max_nb", "max_i", "max_j", "best_sE"):
        a, b = np.asarray(ws1[k]), np.asarray(ws2[k])
        s = np.array_equal(a[mask], b[mask])
        msgs.append(f"{k}={s}")
        ok &= s
    ok &= same_cor and same_lags
    print(" ".join(msgs), flush=True)
    if not same_cor:
        bad = np.argwhere(c1 != c2)
        print("  first cor mismatch:", bad[:5],
              c1[tuple(bad[0])], c2[tuple(bad[0])])
    if not ok:
        for k in ("max_nb", "max_i", "max_j", "best_sE"):
            a, b = np.asarray(ws1[k]), np.asarray(ws2[k])
            d = (a != b) & mask
            if d.any():
                idx = np.argwhere(d)[0]
                print(f"  {k} first mismatch at {idx}: {a[tuple(idx)]} "
                      f"vs {b[tuple(idx)]}")
        break
    state = eng._step(state)

print("ALL MATCH" if ok else "MISMATCH")

# timing
rcodes, rpos, mlen = p_inputs(state)
act = state["active"]
for name, f in (("jax", pj), ("pallas", pp)):
    jax.block_until_ready(f(rcodes, rpos, mlen, act))
    t0 = time.perf_counter()
    for _ in range(5):
        r = jax.block_until_ready(f(rcodes, rpos, mlen, act))
    print(f"{name} path: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
