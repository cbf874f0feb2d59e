"""Timing + parity + budget-pressure check at the bench config."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import numpy as np
import jax

from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
seqs = []
with open(CORPUS) as fh:
    for row in csv.reader(fh):
        if len(row) >= 3 and len(row[0]) <= 120:
            seqs.append(row[0])

NSEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 32
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
cfg = EngineConfig(N=128, K=50, R=16, M=100, V=4096, S=16384, max_branch=1000)
eng = FoldEngine(cfg, B=B)

t0 = time.time()
state = eng.init_state(seqs[:B])
state = eng._step(state)
jax.block_until_ready(state["pt"])
print(f"compile+first step: {time.time()-t0:.1f}s", flush=True)

# steady-state step timing on a populated beam
state = eng._step(state)
jax.block_until_ready(state["pt"])
t0 = time.perf_counter()
REP = 10
for _ in range(REP):
    state = eng._step(state)
jax.block_until_ready(state["pt"])
print(f"steady step: {(time.perf_counter()-t0)/REP*1e3:.1f} ms", flush=True)

# full corpus-sample fold with timing + parity
t0 = time.time()
all_beams = []
drops = []
suspects = []
for off in range(0, NSEQ, B):
    batch = seqs[off:off+B]
    beams, st = eng.run(batch)
    all_beams += beams
    drops.append(np.asarray(st["cplx_dropped"]))
    suspects.append(np.asarray(st["enum_suspect"]))
dt = time.time() - t0
print(f"{NSEQ} seqs in {dt:.1f}s = {NSEQ/dt:.2f} seq/s", flush=True)
drops = np.concatenate(drops)
suspects = np.concatenate(suspects)
print("cplx_dropped:", drops.sum(), "max/seq:", drops.max(), flush=True)
print("enum_suspect: seqs", (suspects > 0).sum(), "total", suspects.sum(),
      flush=True)

# parity vs CPU engine
from rafft_tpu.engine.fold_cpu import fold as cpu_fold
bad = 0
t0 = time.time()
for i, (seq, rows) in enumerate(zip(seqs[:NSEQ], all_beams)):
    ref = cpu_fold(seq, nb_mode=100, max_stack=50, max_branch=1000)
    want = [(s.str_struct, s.energy) for s in ref]
    got = list(rows)
    if got != want:
        bad += 1
        if bad <= 3:
            print(f"MISMATCH seq {i} len {len(seq)}")
            for a, b in zip(got, want):
                if a != b:
                    print("  got ", a)
                    print("  want", b)
                    break
print(f"parity: {NSEQ-bad}/{NSEQ} exact (cpu ref took {time.time()-t0:.1f}s)",
      flush=True)
