import pytest

from tests.conftest import reference_available
from rafft_tpu.scoring import score_structures, score_pairs, best_of

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference checkout")


def test_exact_match():
    assert score_structures("((..))", "((..))") == (100.0, 100.0)


def test_slip_rule():
    # predicted (0,5) vs true (1,5): one-off slip counts
    ppv, sens = score_pairs([(0, 5)], [(1, 5)])
    assert ppv == 100.0 and sens == 100.0
    ppv, sens = score_pairs([(0, 5)], [(2, 5)])
    assert ppv == 0.0 and sens == 0.0


def test_empty_prediction():
    assert score_structures("....", "(..)") == (0.0, 0.0)


def test_best_of_picks_max_ppv():
    # "......" has no pairs (ppv 0); the exact match wins
    ppv, sens, db = best_of(["((..))", "......"], "((..))")
    assert db == "((..))" and ppv == 100.0
    # on PPV ties the structure with the MOST pairs wins (then last in
    # beam order) — the closest mechanical reconstruction of the frozen
    # reference artifact's tie-break (see scoring.best_of docstring)
    truth = "((((....))))"
    dense = "((((....))))"   # 4 pairs
    sparse = ".(((....)))."  # 3 pairs, also PPV 100 under slip
    ppv2, sens2, db2 = best_of([sparse, dense], truth)
    assert db2 == dense and sens2 == 100.0
    # full (ppv, npairs) tie: last in beam order wins
    a = "((((....))))"
    ppv4, sens4, db4 = best_of([a, a], truth)
    assert db4 == a
    # empty predictions are skipped even on 0-PPV ties (scorer nan quirk)
    ppv3, sens3, db3 = best_of(["......", "(...)."], ".(...)")
    assert db3 == "(...)."


@needs_ref
def test_frozen_scorer_parity_sample():
    import csv

    truth = {}
    with open("/root/reference/benchmark_results/benchmark_cleaned_all_length.csv") as fh:
        for row in csv.reader(fh):
            if len(row) >= 3:
                truth[row[0]] = row[1]
    ok = bad = 0
    with open("/root/reference/benchmark_results/fft_100n_50ms_best_nrj_scores.csv") as fh:
        fh.readline()
        for i, line in enumerate(fh):
            if i >= 300:
                break
            p = line.rstrip("\n").split(",")
            seq, struct, pvv, sens = p[0], p[2], float(p[5]), float(p[6])
            if seq not in truth:
                continue
            mp, ms = score_structures(struct, truth[seq])
            if abs(mp - pvv) < 0.006 and abs(ms - sens) < 0.006:
                ok += 1
            else:
                bad += 1
    assert bad <= 1, (ok, bad)
