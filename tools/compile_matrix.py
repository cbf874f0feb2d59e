"""(N, K) compile-time / step-time matrix for the TPU fold engine.

VERDICT r4 item 2: the round-4 200n/200ms sweep spent ~2h on the 64-nt
bucket at K=200 (sweep_200n200_tpu.manifest.json) — almost certainly XLA
compile blow-up in K.  This tool measures, per (N, K) cell, the compile
time of the advance program and the steady-state per-step execute time,
so the K-scaling of both is a committed artifact
(benchmarks/artifacts/compile_matrix.md).

Usage: python tools/compile_matrix.py [--cells 64:50,64:200,...] [--out f]
"""
import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
DEFAULT_CELLS = "128:50,256:50,512:50,128:200,256:200,512:200"


def measure_cell(N, K, steps=4):
    from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig
    from rafft_tpu.parallel.sweep import bucket_batch

    seqs = []
    with open(CORPUS) as fh:
        for row in csv.reader(fh):
            if len(row) >= 3 and N // 2 < len(row[0]) <= N - 8:
                seqs.append(row[0])
    if not seqs:
        rng = np.random.default_rng(0)
        seqs = ["".join(rng.choice(list("ACGU"), N - 8)) for _ in range(8)]
    B = bucket_batch(16, N)
    # sweep.py's config for this bucket (sweep.py:157-165)
    cfg = EngineConfig(N=N, K=K, M=min(200 if K == 200 else 100, 2 * N - 1),
                       R=16 if N <= 512 else 32,
                       max_branch=1000, V=min(8192, 4 * 1000),
                       S=max(16384, 32 * K))
    eng = FoldEngine(cfg, B=B)
    state = eng.init_state(seqs[:B])

    t0 = time.perf_counter()
    state = eng._step(state)
    jax.block_until_ready(state["pt"])
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state = eng._step(state)
    jax.block_until_ready(state["pt"])
    t_step = (time.perf_counter() - t0) / steps
    return dict(N=N, K=K, B=B, compile_s=round(t_compile, 2),
                step_ms=round(t_step * 1e3, 2),
                step_ms_per_seq=round(t_step * 1e3 / B, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default=DEFAULT_CELLS)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for cell in args.cells.split(","):
        N, K = (int(x) for x in cell.split(":"))
        r = measure_cell(N, K)
        rows.append(r)
        print(f"N={r['N']:5d} K={r['K']:4d} B={r['B']:3d} "
              f"compile {r['compile_s']:7.2f} s   step {r['step_ms']:8.2f} ms"
              f"   ({r['step_ms_per_seq']:.3f} ms/seq/step)", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            fh.write("# (N, K) compile/step matrix — TPU fold engine\n\n")
            fh.write(f"Backend: {jax.devices()[0].device_kind}; "
                     "one warm compile per cell (persistent compile cache "
                     "DISABLED would show cold times; these are "
                     "process-cold, cache-warm-on-disk).\n\n")
            fh.write("| N | K | B | compile (s) | step (ms) | ms/seq/step |\n")
            fh.write("|---|---|---|---|---|---|\n")
            for r in rows:
                fh.write(f"| {r['N']} | {r['K']} | {r['B']} | "
                         f"{r['compile_s']} | {r['step_ms']} | "
                         f"{r['step_ms_per_seq']} |\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
