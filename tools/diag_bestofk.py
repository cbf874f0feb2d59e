"""Diagnose the best-of-k selection divergence vs the reference artifact.

The reference pipeline (/root/reference/benchmark_results/bench_fft.py:10-15)
flattens each beam structure to FIVE whitespace tokens
(seq len struct nrj nbp, from bin/rafft --bench), but get_best_score.py:84-92
walks the flat token list with stride TWO: ``zip(range(len(conf))[::2],
range(len(conf))[1::2])``.  Structure k (0-based) sits at flat offset 5k+2,
which is even only for even k — so only beam structures 0, 2, 4, ... are ever
passed to the scorer; the odd ones land in the "score" slot of a pair and the
garbage tokens (seq/len/nrj/nbp) that do get tested contain no brackets, give
zero predicted pairs, PPV=nan, and fail ``pred_pvv >= max_pvv``.

This script re-folds divergent rows with the byte-exact CPU engine and checks
which selection rule reproduces the frozen fft_100n_50ms_scores.csv.
"""

from __future__ import annotations

import argparse
import csv
import sys

sys.path.insert(0, ".")

from rafft_tpu.engine.fold_cpu import fold
from rafft_tpu.scoring import score_pairs
from rafft_tpu.struct import paired_positions

REF = "/root/reference/benchmark_results"


def read_ref_scores(path):
    rows = {}
    with open(path) as fh:
        header = fh.readline()
        for line in fh:
            p = line.rstrip("\n").split(",")
            if len(p) < 8:
                continue
            seq, struct, pvv, sens, name = p[0], p[2], p[5], p[6], p[7]
            rows[seq] = dict(struct=struct, pvv=float(pvv), sens=float(sens),
                             name=name)
    return rows


def read_truth():
    truth = {}
    for line in open(f"{REF}/benchmark_cleaned_all_length.csv"):
        seq, struct, name = line.strip().split(",")
        truth[seq] = struct
    return truth


def select(beam_dbs, true_pairs, stride2=True, skip_empty=True):
    """Replicate get_best_score.test_one_seq over a beam.

    stride2:    only even-indexed beam structures are scored (the reference's
                token-stride bug).
    skip_empty: a structure with zero predicted pairs scores PPV=nan in the
                reference (RNAstructure scorer) and never wins a tie.
    """
    n = len(true_pairs)
    best = (0.0, 0.0, None)
    for k, db in enumerate(beam_dbs):
        if stride2 and k % 2 == 1:
            continue
        pairs = paired_positions(db)
        if skip_empty and not pairs:
            continue
        ppv, sens = score_pairs(pairs, true_pairs)
        if ppv >= best[0]:
            best = (ppv, sens, db)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-len", type=int, default=80)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--all", action="store_true",
                    help="diagnose every row, not only divergent ones")
    args = ap.parse_args()

    ref = read_ref_scores(f"{REF}/fft_100n_50ms_scores.csv")
    ours = read_ref_scores("benchmarks/artifacts/fft_100n_50ms_scores.csv")
    truth = read_truth()

    rows = []
    for seq, r in ref.items():
        if len(seq) > args.max_len or seq not in ours or seq not in truth:
            continue
        o = ours[seq]
        divergent = (o["struct"] != r["struct"])
        if args.all or divergent:
            rows.append((seq, r, o))
    if args.limit:
        rows = rows[: args.limit]
    print(f"{len(rows)} rows to diagnose (max_len={args.max_len})")

    stats = dict(n=0, ref_struct_in_beam=0,
                 cur_match=0, stride2_match=0, stride2_all=0, nostride_skip=0)
    sens_ref = sens_cur = sens_s2 = 0.0
    for i, (seq, r, o) in enumerate(rows):
        beam = fold(seq, nb_mode=100, max_stack=50)
        dbs = [st.str_struct for st in beam]
        tp = paired_positions(truth[seq])
        stats["n"] += 1
        if r["struct"] in dbs:
            stats["ref_struct_in_beam"] += 1
        cur = select(dbs, tp, stride2=False, skip_empty=False)
        s2 = select(dbs, tp, stride2=True, skip_empty=True)
        s2a = select(dbs, tp, stride2=True, skip_empty=False)
        nss = select(dbs, tp, stride2=False, skip_empty=True)
        if cur[2] == r["struct"]:
            stats["cur_match"] += 1
        if s2[2] == r["struct"]:
            stats["stride2_match"] += 1
        if s2a[2] == r["struct"]:
            stats["stride2_all"] += 1
        if nss[2] == r["struct"]:
            stats["nostride_skip"] += 1
        sens_ref += r["sens"]
        sens_cur += cur[1]
        sens_s2 += s2[1]
        if i < 8:
            print(f"  [{r['name'][:40]:40s}] ref_in_beam={r['struct'] in dbs} "
                  f"s2={'OK' if s2[2] == r['struct'] else 'no'} "
                  f"cur={'OK' if cur[2] == r['struct'] else 'no'} "
                  f"sens ref={r['sens']:.1f} s2={s2[1]:.1f} cur={cur[1]:.1f}")

    n = max(stats["n"], 1)
    print(f"\nn={stats['n']}")
    print(f"ref struct in our beam:          {stats['ref_struct_in_beam']}/{n}")
    print(f"current rule matches ref struct: {stats['cur_match']}/{n}")
    print(f"stride2+skip matches ref struct: {stats['stride2_match']}/{n}")
    print(f"stride2 (no skip) matches:       {stats['stride2_all']}/{n}")
    print(f"no-stride+skip matches:          {stats['nostride_skip']}/{n}")
    print(f"mean sens: ref={sens_ref/n:.2f} current={sens_cur/n:.2f} "
          f"stride2={sens_s2/n:.2f}")


if __name__ == "__main__":
    main()
