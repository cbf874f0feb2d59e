"""Reference-style benchmark fan-out on the sequential parity engine.

Mirrors /root/reference/benchmark_results/bench_fft.py (a
multiprocessing.Pool over sequences) but calls the in-process engine
instead of shelling out one interpreter per sequence.  Output rows use
the reference's --bench format: `seq len struct nrj nbp` per saved
structure.

  python benchmarks/bench_parity.py <nproc> [--csv PATH] [--limit N]
      [--max_len N] [-n 100] [-ms 50] [--out fft_rafft_tpu.csv]
"""

import argparse
import csv
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CSV = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"

_ARGS = None


def run_one(rec):
    from rafft_tpu.engine.fold_cpu import fold

    seq, _true, name = rec
    structs = fold(seq, nb_mode=_ARGS.n_mode, max_stack=_ARGS.max_stack,
                   max_branch=_ARGS.max_branch)
    rows = []
    for st in structs:
        rows.append((seq, len(seq), st.str_struct,
                     f"{st.energy:6.1f}", st.str_struct.count("(")))
    return name, rows


def _init(args):
    global _ARGS
    _ARGS = args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("nproc", type=int)
    ap.add_argument("--csv", default=DEFAULT_CSV)
    ap.add_argument("--limit", type=int)
    ap.add_argument("--max_len", type=int)
    ap.add_argument("-n", "--n_mode", type=int, default=100)
    ap.add_argument("-ms", "--max_stack", type=int, default=50)
    ap.add_argument("--max_branch", type=int, default=1000)
    ap.add_argument("--out", default="fft_rafft_tpu.csv")
    args = ap.parse_args()

    records = []
    with open(args.csv) as fh:
        for row in csv.reader(fh):
            if len(row) >= 3:
                records.append((row[0], row[1], row[2]))
    if args.max_len:
        records = [r for r in records if len(r[0]) <= args.max_len]
    if args.limit:
        records = records[: args.limit]

    global _ARGS
    _ARGS = args
    t0 = time.time()
    with Pool(args.nproc, initializer=_init, initargs=(args,)) as pool:
        results = pool.map(run_one, records)
    dt = time.time() - t0

    with open(args.out, "w") as out:
        for name, rows in results:
            flat = []
            for seq, ln, db, nrj, nbp in rows:
                flat += [db, nrj.strip()]
            out.write(",".join([rows[0][0], name] + flat) + "\n")
    print(f"{len(records)} seqs in {dt:.1f}s "
          f"({len(records)/dt:.2f} seq/s with {args.nproc} procs)")


if __name__ == "__main__":
    main()
