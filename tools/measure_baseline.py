"""Measure the 1-core reference-equivalent baseline and freeze it.

The reference publishes no runtime numbers (BASELINE.md), so the
yardstick is our sequential CPU parity engine: the same beam loop as
rafft/rafft.py with an equally-priced table evaluator in place of the
in-process ViennaRNA oracle.  Times `-n 100 -ms 50` over a corpus
sample (<=120 nt, the bench.py population) on one core and writes
benchmarks/baseline_cpu.json, which bench.py uses as vs_baseline.
"""
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rafft_tpu.engine.fold_cpu import fold as cpu_fold

CORPUS = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "baseline_cpu.json")


def main():
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    seqs = []
    with open(CORPUS) as fh:
        for row in csv.reader(fh):
            if len(row) >= 3 and len(row[0]) <= 120:
                seqs.append(row[0])
    # deterministic spread over the corpus
    stride = max(1, len(seqs) // n_sample)
    sample = seqs[::stride][:n_sample]
    t0 = time.time()
    for s in sample:
        cpu_fold(s, nb_mode=100, max_stack=50, max_branch=1000)
    dt = time.time() - t0
    rate = len(sample) / dt
    art = dict(seqs_per_s=round(rate, 4), n_seqs=len(sample),
               wall_s=round(dt, 2), config="-n 100 -ms 50",
               population="corpus <=120 nt (bench.py population)",
               engine="rafft_tpu.engine.fold_cpu (sequential, 1 core)")
    with open(OUT, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    main()
