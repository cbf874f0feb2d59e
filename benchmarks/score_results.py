"""Score prediction files against ground truth — the reference's
scoring.py / get_best_score.py / score_best.py pipeline, self-contained
(no RNAstructure binary).

Input formats:
  --format bench : rows `seq,name,struct1,nrj1,struct2,nrj2,...`
                   (bench_parity.py output; best-of-k scored like
                   get_best_score.py, or best-energy-only with --one)
  --format results : the result-CSV schema
                   `seq,len_seq,struct,nrj,...` (scored as-is)

Output: the reference result-CSV schema
  seq,len_seq,struct,nrj,nbp,pvv,sens,name
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rafft_tpu.scoring import score_structures, best_of  # noqa: E402
from rafft_tpu.energy.eval_np import eval_structure  # noqa: E402

DEFAULT_TRUTH = "/root/reference/benchmark_results/benchmark_cleaned_all_length.csv"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_file")
    ap.add_argument("output_file")
    ap.add_argument("--true_struct", default=DEFAULT_TRUTH)
    ap.add_argument("--format", choices=("bench", "results"), default="bench")
    ap.add_argument("--one", action="store_true",
                    help="score only the best-energy structure")
    args = ap.parse_args()

    truth = {}
    with open(args.true_struct) as fh:
        for row in csv.reader(fh):
            if len(row) >= 3:
                truth[row[0]] = (row[1], row[2])

    out_rows = []
    with open(args.input_file) as fh:
        for line in fh:
            parts = line.rstrip("\n").split(",")
            if args.format == "results":
                if parts[0] == "seq":
                    continue
                seq, struct, name = parts[0], parts[2], parts[7]
                cands = [struct]
            else:
                seq, name = parts[0], parts[1]
                cands = parts[2::2]
            if seq not in truth:
                continue
            true_db, _tn = truth[seq]
            if args.one:
                cands = cands[:1]
            ppv, sens, best_db = best_of(cands, true_db)
            nrj = eval_structure(seq, best_db)
            out_rows.append((seq, len(seq), best_db, nrj,
                             best_db.count("("), ppv, sens, name))

    with open(args.output_file, "w") as out:
        out.write("seq,len_seq,struct,nrj,nbp,pvv,sens,name\n")
        for r in out_rows:
            out.write(",".join(str(x) for x in r) + "\n")

    if out_rows:
        mp = sum(r[5] for r in out_rows) / len(out_rows)
        ms = sum(r[6] for r in out_rows) / len(out_rows)
        print(f"{len(out_rows)} rows; mean PPV {mp:.2f}, mean sens {ms:.2f}")


if __name__ == "__main__":
    main()
