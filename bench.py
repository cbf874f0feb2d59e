"""Benchmark entry point — run by the driver on real TPU hardware.

Measures the TPU fold engine's throughput on the reference benchmark
corpus at the reference's headline configuration (-n 100 -ms 50,
/root/reference/benchmark_results/bench_fft.py:8) and prints ONE JSON
line.

Baseline: the reference publishes no runtime numbers (BASELINE.md).  Its
measured profile here is ~1.1 s/sequence for <=120 nt at this config
(our CPU parity engine, which replaces the reference's in-process
ViennaRNA C oracle with an equally-priced table evaluator; the reference
is the same sequential Python beam loop).  We use 1.0 seq/s/core as the
reference baseline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_BASELINE_SEQS_PER_S = 1.0
CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"


def main():
    import csv

    import numpy as np

    from rafft_tpu.engine.fold_jax import FoldEngine, EngineConfig

    seqs = []
    if os.path.exists(CORPUS):
        with open(CORPUS) as fh:
            for row in csv.reader(fh):
                if len(row) >= 3 and len(row[0]) <= 120:
                    seqs.append(row[0])
    if not seqs:  # fallback corpus
        rng = np.random.default_rng(0)
        seqs = ["".join(rng.choice(list("ACGU"), 100)) for _ in range(64)]

    B = 16
    n_seqs = 256
    seqs = seqs[:n_seqs]
    cfg = EngineConfig(N=128, K=50, R=16, M=100, V=4096, S=16384,
                       max_branch=1000)
    eng = FoldEngine(cfg, B=B)

    # warmup/compile on the first batch (step + refill)
    state = eng.init_state(seqs[:B])
    for _ in range(cfg.max_steps):
        if bool(np.asarray(state["done"]).all()):
            break
        state = eng._step(state)
    state = eng.refill(state, [0], [seqs[0]])

    t0 = time.time()
    folded = 0
    # continuous batching: finished slots take fresh sequences mid-flight
    pending = list(range(B, len(seqs)))[::-1]
    slot_busy = [True] * B
    slot_steps = [0] * B
    state = eng.init_state(seqs[:B])
    while any(slot_busy):
        state = eng._step(state)
        done = np.asarray(state["done"])
        fins = []
        for b in range(B):
            if not slot_busy[b]:
                continue
            slot_steps[b] += 1
            if done[b] or slot_steps[b] >= cfg.max_steps:
                fins.append(b)
        if not fins:
            continue
        refill = []
        for b in fins:
            folded += 1
            slot_steps[b] = 0
            if pending:
                refill.append(seqs[pending.pop()])
            else:
                refill.append(None)
                slot_busy[b] = False
        state = eng.refill(state, fins, refill)
    dt = time.time() - t0

    thr = folded / dt
    print(json.dumps({
        "metric": "fold_throughput_n100_ms50_le120nt",
        "value": round(thr, 3),
        "unit": "seq/s",
        "vs_baseline": round(thr / REFERENCE_BASELINE_SEQS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
