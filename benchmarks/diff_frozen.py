"""Compare a sweep results CSV against the reference's frozen predictions.

The reference repo ships the structures/energies its authors computed on
the full corpus (benchmark_results/fft_100n_50ms_best_nrj_scores.csv —
best-energy structure of the 50 saved at -n 100 -ms 50).  Matching those
rows is end-to-end parity evidence against the *actual* reference +
ViennaRNA stack, not just our own CPU oracle.

  python benchmarks/diff_frozen.py <ours.csv> [--frozen PATH] [-v]
"""

import argparse
import csv
import sys

FROZEN = ("/root/reference/benchmark_results/"
          "fft_100n_50ms_best_nrj_scores.csv")


def load(path):
    rows = {}
    with open(path) as fh:
        rd = csv.DictReader(fh)
        for r in rd:
            rows[r["seq"]] = (r["struct"], round(float(r["nrj"]), 1))
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ours")
    ap.add_argument("--frozen", default=FROZEN)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    ours = load(args.ours)
    frozen = load(args.frozen)

    both = sorted(set(ours) & set(frozen), key=len)
    same = nrj_same = 0
    for seq in both:
        os_, oe = ours[seq]
        fs_, fe = frozen[seq]
        if os_ == fs_ and oe == fe:
            same += 1
        elif oe == fe:
            nrj_same += 1
            if args.verbose:
                print(f"STRUCT-DIFF len {len(seq)} nrj {oe}")
        else:
            if args.verbose:
                print(f"DIFF len {len(seq)}: ours {oe} frozen {fe}")
                print(f"  ours   {os_}")
                print(f"  frozen {fs_}")
    print(f"{len(both)} shared; exact {same} "
          f"({100.0*same/max(1,len(both)):.1f}%); same-energy-diff-struct "
          f"{nrj_same}; diverged {len(both)-same-nrj_same}")


if __name__ == "__main__":
    main()
