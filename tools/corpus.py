"""Extract the frozen (sequence, structure, exact-integer-energy) corpus
from the reference benchmark CSVs.

The reference's result CSVs store energies as Python reprs of the C-float
values returned by the ViennaRNA oracle (e.g. ``-157.1999969482422`` ==
float32(-157.20)), so round(x*100) recovers the exact integer dekacal
value.  Sources (see SURVEY.md C10/C11):

  fft_100n_50ms_scores.csv / fft_100n_50ms_best_nrj_scores.csv /
  fft_200n_200ms_scores.csv : RAFFT predictions, eval_structure energies
  mfe_scores.csv            : ViennaRNA MFE structures + energies
  mxfold_scores.csv         : mxfold2 structures re-scored by the oracle

Output: list of (seq, struct, e_int) deduplicated on (seq, struct).
"""

from __future__ import annotations

import os

REF_BENCH = "/root/reference/benchmark_results"

CSV_FILES = [
    "fft_100n_50ms_scores.csv",
    "fft_100n_50ms_best_nrj_scores.csv",
    "fft_200n_200ms_scores.csv",
    "mfe_scores.csv",
    "mxfold_scores.csv",
]


def load_corpus(files=None, include_names=False):
    files = files if files is not None else CSV_FILES
    seen = set()
    out = []
    for fname in files:
        path = os.path.join(REF_BENCH, fname)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            header = fh.readline()
            assert header.startswith("seq,"), (fname, header)
            for line in fh:
                parts = line.rstrip("\n").split(",")
                if len(parts) < 8:
                    continue
                seq, _len, struct, nrj = parts[0], parts[1], parts[2], parts[3]
                name = parts[7]
                if nrj in ("Na", "nan", ""):
                    continue
                if len(struct) != len(seq):
                    continue
                key = (seq, struct)
                if key in seen:
                    continue
                seen.add(key)
                e_int = round(float(nrj) * 100)
                if include_names:
                    out.append((seq, struct, e_int, name))
                else:
                    out.append((seq, struct, e_int))
    return out


if __name__ == "__main__":
    corpus = load_corpus()
    print(f"{len(corpus)} unique (seq, struct, energy) triples")
    lens = sorted(len(s) for s, _, _ in corpus)
    print(f"len range {lens[0]}..{lens[-1]}")
