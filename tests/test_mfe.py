"""MFE (Zuker) folding tests.

Validates the native C++ DP against the reference's frozen ViennaRNA
`RNA.fold` results (/root/reference/benchmark_results/mfe_scores.csv)
and the batched JAX DP against the native backend.
"""

import csv
import os

import numpy as np
import pytest

MFE_CSV = "/root/reference/benchmark_results/mfe_scores.csv"


def _records(max_len, limit):
    if not os.path.exists(MFE_CSV):
        pytest.skip("reference mfe_scores.csv unavailable")
    seen, out = set(), []
    with open(MFE_CSV) as fh:
        for r in csv.DictReader(fh):
            if r["name"] in seen or len(r["seq"]) > max_len:
                continue
            seen.add(r["name"])
            out.append(r)
            if len(out) >= limit:
                break
    return out


def test_native_mfe_vs_vienna_corpus():
    """Energy parity with ViennaRNA's MFE on the frozen corpus.

    >=97% exact is the bar: ~1% of sequences hit corpus-calibration
    artifacts (see tools/calibrate_energy.py NOTE on mm1n)."""
    from rafft_tpu.mfe import mfe_fold

    recs = _records(max_len=150, limit=200)
    e_ok = s_ok = 0
    for r in recs:
        db, e = mfe_fold(r["seq"])
        if abs(e - round(float(r["nrj"]), 2)) < 0.005:
            e_ok += 1
        if db == r["struct"]:
            s_ok += 1
    assert e_ok >= 0.97 * len(recs), (e_ok, len(recs))
    assert s_ok >= 0.95 * len(recs), (s_ok, len(recs))


def test_native_mfe_traceback_consistent():
    """The traced structure re-evaluates to the DP energy (self-check
    independent of ViennaRNA)."""
    from rafft_tpu.mfe import mfe_fold
    from rafft_tpu.energy.eval_np import eval_structure

    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(20, 90))
        seq = "".join(rng.choice(list("ACGU"), n))
        db, e = mfe_fold(seq)
        assert abs(eval_structure(seq, db) - e) < 1e-9, seq


def test_jax_mfe_matches_native():
    from rafft_tpu.mfe import mfe_fold
    from rafft_tpu.mfe.mfe_jax import mfe_batch

    recs = _records(max_len=120, limit=8)
    seqs = [r["seq"] for r in recs]
    rng = np.random.default_rng(3)
    seqs += ["".join(rng.choice(list("ACGU"), int(rng.integers(15, 100))))
             for _ in range(8)]
    out = mfe_batch(seqs)
    for s, (db, e) in zip(seqs, out):
        db2, e2 = mfe_fold(s)
        assert abs(e - e2) < 1e-9, (s, e, e2)
        assert db == db2, (s, db, db2)


def test_mfe_empty_and_tiny():
    from rafft_tpu.mfe import mfe_fold

    for seq in ["A", "ACGU", "AAAAA"]:
        db, e = mfe_fold(seq)
        assert db == "." * len(seq)
        assert e == 0.0
