"""Per-stage profile of one FoldEngine step at the bench config.

Uses fold_jax._PROFILE_CUT: for each pipeline stage the step is
re-jitted with an early return right after that stage, so XLA
dead-code-eliminates everything later; the difference between
consecutive cumulative timings is the cost of each stage ON THE REAL
program (fusions included), which phase-probe timing of isolated
sub-functions cannot see.

Usage: python tools/profile_step.py [B] [K] [N] [steps-to-warm]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import numpy as np
import jax

from rafft_tpu.engine import fold_jax as FJ
from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
N = int(sys.argv[3]) if len(sys.argv) > 3 else 128
WARM = int(sys.argv[4]) if len(sys.argv) > 4 else 2

seqs = []
with open(CORPUS) as fh:
    for row in csv.reader(fh):
        if len(row) >= 3 and len(row[0]) <= N - 8:
            seqs.append(row[0])
seqs.sort(key=len, reverse=True)

cfg = EngineConfig(N=N, K=K, R=16, M=100, V=4096, S=16384, max_branch=1000)
eng = FoldEngine(cfg, B=B)

state = eng.init_state(seqs[:B])
for _ in range(WARM):
    state = eng._step(state)
jax.block_until_ready(state["pt"])


def timeit(f, *a, n=6):
    r = jax.block_until_ready(f(*a))       # compile
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n, r


print(f"config: B={B} K={K} N={N} R={cfg.R} M={cfg.M} V={cfg.V} "
      f"S={cfg.S} CPLX={cfg.CPLX}  (after {WARM} warm steps)")
prev = 0.0
rows = []
for stage in FJ._STAGES:
    FJ._PROFILE_CUT = None if stage == "full" else stage
    # fresh lambda: jax.jit caches traces globally by function identity,
    # so jit(eng._step_impl) would silently reuse the full-step trace
    step = jax.jit(lambda s, _stage=stage: eng._step_impl(s))
    tc0 = time.perf_counter()
    t, _ = timeit(step, state)
    tc = time.perf_counter() - tc0 - 6 * t
    rows.append((stage, t, t - prev, tc))
    print(f"{stage:>8}  cum {t*1e3:8.2f} ms   stage {max(t-prev,0)*1e3:8.2f} ms"
          f"   (compile {tc:5.1f} s)", flush=True)
    prev = t
FJ._PROFILE_CUT = None

tot = rows[-1][1]
print("\n%-10s %9s %6s" % ("stage", "ms", "share"))
for stage, t, d, _ in rows:
    print("%-10s %9.2f %5.1f%%" % (stage, max(d, 0) * 1e3,
                                   100 * max(d, 0) / tot))
print(f"total step {tot*1e3:.2f} ms  ({B} seqs -> {tot*1e3/B:.3f} ms/seq/step)")
