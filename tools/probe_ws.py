"""Split window_scan cost: diagonal-gather precompute vs the H while-loop."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import numpy as np
import jax, jax.numpy as jnp

from rafft_tpu.engine import fold_jax as FJ
from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig
from rafft_tpu.engine.lookup import flat_lookup, diag_extract

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
seqs = []
with open(CORPUS) as fh:
    for row in csv.reader(fh):
        if len(row) >= 3 and len(row[0]) <= 120:
            seqs.append(row[0])
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = EngineConfig(N=128, K=50, R=16, M=100, V=4096, S=16384, max_branch=1000)
eng = FoldEngine(cfg, B=B)
dp, W = eng.dp, eng.W

state = eng.init_state(seqs[:B])
state = eng._step(state)
state = eng._step(state)
jax.block_until_ready(state["pt"])


def timeit(f, *a, n=5):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n, r


def phase_inputs(st):
    def one(codes, n, pt, rorder):
        loops = jax.vmap(lambda p: FJ.analyze_pt(dp, codes, p, n))(pt)
        rpos, rloc, rslot, mlen = FJ._regions(cfg, pt, loops["enclose"], rorder, n)
        rcodes = jnp.where(rpos < cfg.N, codes[jnp.clip(rpos, 0, cfg.N - 1)], 0)
        cor = FJ._correlate(cfg, W, rcodes, mlen, eng.integral)
        lags, lvals = FJ._top_lags(cfg, cor)
        lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, None] >= 2)
        return rcodes, rpos, mlen, lags, lag_ok
    return jax.vmap(one)(st["codes"], st["n"], st["pt"], st["rorder"])

rcodes, rpos, mlen, lags, lag_ok = jax.block_until_ready(
    jax.jit(phase_inputs)(state))
lag_ok = lag_ok & state["active"][:, :, None, None]

K, R, M, N = cfg.K, cfg.R, cfg.M, cfg.N
H = N // 2 + 1


def precompute(rcodes, rpos, mlen, lags, lag_ok):
    """Everything window_scan does before the while_loop."""
    def one(rcodes, rpos, mlen, lags, lag_ok):
        m = mlen[:, :, None]
        lag = lags
        w_width = jnp.where(lag < m, lag + 1, 2 * m - lag - 1)
        half = w_width // 2 + (w_width % 2)
        base = jnp.maximum(lag - m + 1, 0)
        io = jnp.arange(H, dtype=jnp.int32)[:, None, None, None]
        idx5 = base[None] + io
        idx3 = lag[None] - idx5
        T2 = jnp.stack([rcodes, rpos], axis=-1)
        d5 = diag_extract(T2, jnp.clip(idx5, 0, N - 1))
        d3 = diag_extract(T2, jnp.clip(idx3, 0, N - 1))
        c5 = d5[..., 0].astype(jnp.int32)
        p5 = d5[..., 1].astype(jnp.int32)
        c3 = d3[..., 0].astype(jnp.int32)
        p3 = d3[..., 1].astype(jnp.int32)

        def shift1(x, fill):
            return jnp.concatenate([jnp.full_like(x[:1], fill), x[:-1]], axis=0)
        c5m = shift1(c5, 0)
        c3p = shift1(c3, 0)
        p5m = shift1(p5, -9)
        p3p = shift1(p3, -9)
        Wn = np.asarray(W, dtype=np.float32)
        PTn = np.asarray(dp.pair_type)

        def wchain(a, b):
            lin = a * 5 + b
            out = jnp.zeros(lin.shape, jnp.float32)
            for v, x in enumerate(Wn.reshape(-1)):
                if x != 0:
                    out = jnp.where(lin == v, jnp.float32(x), out)
            return out

        def pchain(a, b):
            lin = a * 5 + b
            out = jnp.full(lin.shape, jnp.int32(7))
            for v, x in enumerate(PTn.reshape(-1)):
                if x != 0:
                    out = jnp.where(lin == v, jnp.int32(x), out)
            return out
        w = wchain(c5, c3)
        contig = (io > 0) & (p5 - p5m == 1) & (p3p - p3 == 1)
        g = flat_lookup(dp.stack.reshape(-1), pchain(c5m, c3p) * 8 + pchain(c3, c5))
        in_win = (io < half[None]) & lag_ok[None]
        upd_ok = in_win & ((p3 - p5) > cfg.min_hp)
        ip = base[None] + io
        jp = lag[None] - ip
        return w, contig, g, in_win, upd_ok, ip, jp, half
    return jax.vmap(one)(rcodes, rpos, mlen, lags, lag_ok)

p_pre = jax.jit(precompute)
t, pre = timeit(p_pre, rcodes, rpos, mlen, lags, lag_ok)
print(f"ws precompute      {t*1e3:8.1f} ms")
w, contig, g, in_win, upd_ok, ip, jp, half = pre
half = jnp.where(lag_ok, half, 0)


def loop_only(w, contig, g, in_win, upd_ok, ip, jp, half):
    def one(w, contig, g, in_win, upd_ok, ip, jp, half):
        shape = (K, R, M)
        state = dict(
            tot=jnp.zeros(shape, jnp.float32),
            tmp_max=jnp.zeros(shape, jnp.int32),
            max_score=jnp.zeros(shape, jnp.float32),
            max_nb=jnp.zeros(shape, jnp.int32),
            max_i=jnp.zeros(shape, jnp.int32),
            max_j=jnp.zeros(shape, jnp.int32),
            sE=jnp.zeros(shape, jnp.int32),
            best_sE=jnp.zeros(shape, jnp.int32),
        )

        def body(i, st):
            wi = w[i]; ci = contig[i]; gi = g[i]
            iw = in_win[i]; uo = upd_ok[i]
            tot_prev = st["tot"]
            tot = jnp.where(ci, (tot_prev + wi) * wi, wi)
            tmp_max = jnp.where(tot == 0, 0, st["tmp_max"] + 1)
            in_run = (tot != 0) & (tot_prev != 0) & ci
            sE = jnp.where((tot == 0) | (tot_prev == 0), 0,
                           jnp.where(in_run, st["sE"] + gi, st["sE"]))
            upd = uo & (tot >= st["max_score"])
            st = dict(st)
            st["tot"] = jnp.where(iw, tot, st["tot"])
            st["tmp_max"] = jnp.where(iw, tmp_max, st["tmp_max"])
            st["sE"] = jnp.where(iw, sE, st["sE"])
            st["max_score"] = jnp.where(upd, tot, st["max_score"])
            st["max_nb"] = jnp.where(upd, tmp_max, st["max_nb"])
            st["max_i"] = jnp.where(upd, ip[i], st["max_i"])
            st["max_j"] = jnp.where(upd, jp[i], st["max_j"])
            st["best_sE"] = jnp.where(upd, sE, st["best_sE"])
            return st

        h_dyn = jnp.minimum(jnp.max(half), jnp.int32(H))

        def cond(c):
            return c[0] < h_dyn

        def wbody(c):
            i, st = c
            return i + 1, body(i, st)
        _, st = jax.lax.while_loop(cond, wbody, (jnp.int32(0), state))
        return st
    return jax.vmap(one)(w, contig, g, in_win, upd_ok, ip, jp, half)

p_loop = jax.jit(loop_only)
t, _ = timeit(p_loop, w, contig, g, in_win, upd_ok, ip, jp, half)
print(f"ws while-loop      {t*1e3:8.1f} ms")
print("h_dyn per batch el:", np.asarray(jnp.max(jnp.where(lag_ok, half, 0),
                                                axis=(1, 2, 3))))
