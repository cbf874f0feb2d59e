"""Benchmark entry point — run by the driver on real TPU hardware.

Measures the TPU fold engine's throughput on the reference benchmark
corpus at the reference's headline configuration (-n 100 -ms 50,
/root/reference/benchmark_results/bench_fft.py:8) and prints ONE JSON
line.

Baseline: the reference publishes no runtime numbers (BASELINE.md).
tools/measure_baseline.py times the sequential CPU parity engine (the
same beam loop as the reference with an equally-priced table oracle in
place of in-process ViennaRNA) over a corpus sample and freezes the
result in benchmarks/baseline_cpu.json; that measured number is the
1-core baseline here (fallback 1.0 seq/s if the artifact is missing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
BASELINE_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "baseline_cpu.json")


def main():
    import csv

    from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig

    base = 1.0
    if os.path.exists(BASELINE_ART):
        with open(BASELINE_ART) as fh:
            base = float(json.load(fh)["seqs_per_s"])

    seqs = []
    if os.path.exists(CORPUS):
        with open(CORPUS) as fh:
            for row in csv.reader(fh):
                if len(row) >= 3 and len(row[0]) <= 120:
                    seqs.append(row[0])
    if not seqs:  # fallback corpus
        import numpy as np
        rng = np.random.default_rng(0)
        seqs = ["".join(rng.choice(list("ACGU"), 100)) for _ in range(64)]

    B = 16
    n_seqs = 256
    seqs = seqs[:n_seqs]
    cfg = EngineConfig(N=128, K=50, R=16, M=100, V=4096, S=16384,
                       max_branch=1000)
    eng = FoldEngine(cfg, B=B)

    # warmup/compile (advance + drain paths)
    for _ in eng.run_stream(seqs[:B]):
        pass

    t0 = time.time()
    folded = 0
    cells = 0
    for i, _rows, _flagged in eng.run_stream(seqs):
        folded += 1
        cells += len(seqs[i]) ** 2
    dt = time.time() - t0

    thr = folded / dt
    print(json.dumps({
        "metric": "fold_throughput_n100_ms50_le120nt",
        "value": round(thr, 3),
        "unit": "seq/s",
        "vs_baseline": round(thr / base, 2),
        "gcups": round(cells / dt / 1e9, 4),
        "n_seqs": folded,
        "baseline_seqs_per_s": base,
    }))


if __name__ == "__main__":
    main()
