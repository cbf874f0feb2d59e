"""Split candidate_delta cost into its component lookups."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import numpy as np
import jax, jax.numpy as jnp

from rafft_tpu.engine import fold_jax as FJ
from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig
from rafft_tpu.engine.lookup import batched_taa, flat_lookup
from rafft_tpu.energy.eval_jax import (_hairpin, _int_loop, _ext_stem,
                                       _ml_stem, _ptype, _kmer_keys)

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
K, R, M, N = cfg.K, cfg.R, cfg.M, cfg.N

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


def phase_pre(st):
    def one(codes, n, pt, rorder):
        loops = jax.vmap(lambda p: FJ.analyze_pt(dp, codes, p, n))(pt)
        rpos, rloc, rslot, mlen = FJ._regions(cfg, pt, loops["enclose"], rorder, n)
        rcodes = jnp.where(rpos < cfg.N, codes[jnp.clip(rpos, 0, cfg.N - 1)], 0)
        cor = FJ._correlate(cfg, W, rcodes, mlen, eng.integral)
        lags, lvals = FJ._top_lags(cfg, cor)
        lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, None] >= 2)
        ws = FJ._window_scan(cfg, dp, W, rcodes, rpos, mlen, lags, lag_ok)
        return loops, rpos, mlen, lags, ws
    return jax.vmap(one)(st["codes"], st["n"], st["pt"], st["rorder"])


loops, rpos, mlen, lags, ws = jax.block_until_ready(jax.jit(phase_pre)(state))
codes, n, pt, rorder = state["codes"], state["n"], state["pt"], state["rorder"]

# components, each vmapped+jitted standalone
C = 48


def run(label, fn, *args):
    f = jax.jit(lambda *a: jax.vmap(fn)(*a))
    t, _ = timeit(f, *args)
    print(f"{label:24s} {t*1e3:8.1f} ms")


def f_children(codes, n, pt, lp, ror):
    return FJ._children(cfg, pt, lp, ror, C)
run("children", f_children, codes, n, pt, loops, rorder)


def f_gpos(codes, n, pt, lp, ror, rp, ml, w_i, w_j, w_nb):
    def gpos(arr, idx):
        return batched_taa(arr, jnp.clip(idx, 0, N - 1))
    run_ = w_nb
    p0 = gpos(rp, w_i)
    q0 = gpos(rp, w_j)
    a = gpos(rp, w_i - run_ + 1)
    b2 = gpos(rp, w_j + run_ - 1)
    return p0, q0, a, b2
run("gpos x4", f_gpos, codes, n, pt, loops, rorder, rpos, mlen,
    ws["max_i"], ws["max_j"], ws["max_nb"])

pq = jax.jit(lambda rp, wi, wj, wnb: jax.vmap(f_gpos)(
    codes, n, pt, loops, rorder, rp, mlen, wi, wj, wnb))(
    rpos, ws["max_i"], ws["max_j"], ws["max_nb"])
p0, q0, a, b2 = jax.block_until_ready(pq)


def f_keys(codes):
    return (_kmer_keys(codes, 5), _kmer_keys(codes, 6), _kmer_keys(codes, 8))
keys = jax.jit(lambda c: jax.vmap(f_keys)(c))(codes)
run("kmer_keys", f_keys, codes)


def f_hairpin(codes, n, k5, k6, k8, p0, q0):
    return _hairpin(dp, codes, n, jnp.clip(p0, 0, N - 1),
                    jnp.clip(q0, 0, N - 1), k5, k6, k8)
run("hairpin", f_hairpin, codes, n, keys[0], keys[1], keys[2], p0, q0)


def f_intloop(codes, n, p0, q0, a, b2):
    return _int_loop(dp, codes, n, jnp.clip(p0, 0, N - 1),
                     jnp.clip(q0, 0, N - 1), jnp.clip(a, 0, N - 1),
                     jnp.clip(b2, 0, N - 1))
run("int_loop x1", f_intloop, codes, n, p0, q0, a, b2)


def f_ext(codes, n, a, b2):
    return _ext_stem(dp, codes, n, jnp.clip(a, 0, N - 1),
                     jnp.clip(b2, 0, N - 1))
run("ext_stem", f_ext, codes, n, a, b2)


def f_mlstem(codes, n, a, b2):
    def cvec(idx):
        ok = (idx >= 0) & (idx < n)
        return jnp.where(ok, flat_lookup(codes, jnp.clip(idx, 0, N - 1)), 0)
    t = _ptype(dp, cvec(a), cvec(b2))
    return _ml_stem(dp, t, cvec(a - 1), cvec(b2 + 1))
run("mlstem_at", f_mlstem, codes, n, a, b2)


def f_full(codes, n, pt, lp, ror, rp, ml, w, lg):
    keys = (_kmer_keys(codes, 5), _kmer_keys(codes, 6), _kmer_keys(codes, 8))
    return FJ._candidate_delta(cfg, dp, codes, n, keys, pt, lp, ror, rp, ml, w, lg)
run("FULL candidate_delta", f_full, codes, n, pt, loops, rorder, rpos,
    mlen, ws, lags)
