"""Energy-table coverage + held-out validation report (VERDICT r2 #7).

Quantifies how well the frozen corpus pins the calibrated tables:

1. per-key corpus support for every calibrated override
   (rafft_tpu/energy/_calibrated.OVERRIDES): how many corpus rows touch
   each key, how many overrides have zero support;
2. a held-out split: re-fit the calibration on the 100n/50ms + MFE +
   mxfold rows only, then evaluate exactness on the held-out
   200n/200ms rows (never seen by that fit) — the generalisation test
   the full-corpus fit can't provide.

Writes benchmarks/artifacts/table_coverage.md.

Run:  python tools/table_coverage.py            (~2-5 min, CPU)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the calibration fit needs pristine priors (set before energy imports)
os.environ["RAFFT_NO_CALIB"] = "1"

import importlib.util

import numpy as np

from tools.corpus import load_corpus, CSV_FILES
from tools import calibrate_energy as CE
from rafft_tpu.energy.features import featurize, value_of
from rafft_tpu.energy.params import get_params

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "artifacts",
    "table_coverage.md")


def _fresh_params():
    get_params.cache_clear()
    return get_params(37.0)


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def exactness(rows, params):
    bad = 0
    for seq, struct, e in rows:
        feats, offset = featurize(seq, struct, params)
        pred = offset + sum(c * value_of(k, params)
                            for k, c in feats.items())
        bad += int(pred != e)
    return len(rows) - bad, len(rows)


def main():
    lines = []

    def emit(s=""):
        lines.append(s)
        print(s, flush=True)

    corpus_all = load_corpus()
    train_files = [f for f in CSV_FILES if "200n_200ms" not in f]
    held_files = [f for f in CSV_FILES if "200n_200ms" in f]
    corpus_train = load_corpus(train_files)
    train_keys = {(s, t) for s, t, _ in corpus_train}
    corpus_held = [r for r in load_corpus(held_files)
                   if (r[0], r[1]) not in train_keys]

    emit("# Energy-table coverage report")
    emit()
    emit(f"- corpus rows: {len(corpus_all)} total; train split "
         f"(100n/50ms + MFE + mxfold) {len(corpus_train)}; held-out "
         f"(200n/200ms only, deduped vs train) {len(corpus_held)}")

    # ---- 1. per-key support
    p0 = _fresh_params()
    support = Counter()
    for seq, struct, _e in corpus_all:
        feats, _off = featurize(seq, struct, p0, specials_as_params=True)
        for k in feats:
            support[k] += 1
    calib = _load_module(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rafft_tpu", "energy", "_calibrated.py"), "_calib_full")
    ov = calib.OVERRIDES
    sup = {k: support.get(k, 0) for k in ov}
    hist = Counter()
    for k, s in sup.items():
        hist["0" if s == 0 else "1-9" if s < 10 else
             "10-99" if s < 100 else "100+"] += 1
    emit()
    emit("## Override support (rows touching each calibrated key)")
    emit()
    emit(f"- overrides: {len(ov)}")
    for b in ("0", "1-9", "10-99", "100+"):
        emit(f"- support {b}: {hist.get(b, 0)}")
    zero = sorted([k for k, s in sup.items() if s == 0], key=str)
    emit()
    emit(f"Zero-support overrides ({len(zero)}) — these came from the "
         "golden-example window refinement (tools/refine_from_examples.py)"
         " or symmetry completion, not the corpus fit:")
    for k in zero:
        emit(f"  - `{k}` = {ov[k]}")
    # special-loop entries beyond the corpus
    sp_zero = []
    for name, tab in (("tri", calib.TRILOOPS), ("tetra", calib.TETRALOOPS),
                      ("hexa", calib.HEXALOOPS)):
        for s in tab:
            if support.get((name, s), 0) == 0:
                sp_zero.append((name, s))
    emit()
    emit(f"Special hairpin entries with zero corpus support: "
         f"{len(sp_zero)} of "
         f"{len(calib.TRILOOPS) + len(calib.TETRALOOPS) + len(calib.HEXALOOPS)}")

    # ---- 2. held-out fit
    emit()
    emit("## Held-out validation (fit without 200n/200ms, test on it)")
    emit()
    tmp = "/tmp/_calib_heldout.py"
    CE.main(out_path=tmp, corpus=corpus_train)
    held_mod = _load_module(tmp, "_calib_heldout")

    p_full = _fresh_params()
    calib.apply(p_full)
    p_held = _fresh_params()
    held_mod.apply(p_held)

    ok_f, n = exactness(corpus_held, p_full)
    ok_h, _ = exactness(corpus_held, p_held)
    ok_t, nt = exactness(corpus_train, p_held)
    emit(f"- held-out rows exact, full-corpus fit:   {ok_f}/{n}")
    emit(f"- held-out rows exact, held-out fit:      {ok_h}/{n} "
         f"({100.0 * ok_h / max(n, 1):.2f}% — never saw these rows)")
    emit(f"- train rows exact, held-out fit:         {ok_t}/{nt}")

    # ---- 3. misfit attribution (VERDICT r3 #9: why not >=95%)
    emit()
    emit("## Misfit attribution — why prior-preference cannot close the "
         "gap")
    emit()
    train_keys = set()
    for seq, struct, _e in corpus_train:
        feats, _off = featurize(seq, struct, p0, specials_as_params=True)
        train_keys.update(feats)
    all_keys = set(train_keys)
    mis = mis_unseen = 0
    errs = []
    unseen_kinds = Counter()
    for seq, struct, e in corpus_held:
        feats, off = featurize(seq, struct, p_held,
                               specials_as_params=True)
        all_keys.update(feats)
        pred = off + sum(c * value_of(k, p_held)
                         for k, c in feats.items())
        if pred != e:
            mis += 1
            errs.append(abs(pred - e))
            unseen = [k for k in feats if k not in train_keys]
            if unseen:
                mis_unseen += 1
                for k in unseen:
                    unseen_kinds[k[0]] += 1
    emit(f"- held-out misfit rows: {mis}; of these, {mis_unseen} touch at "
         f"least one table key that appears in **no** train row (kinds: "
         f"{dict(unseen_kinds.most_common())}) — those keys sit at their "
         f"published prior, which the held-out data contradicts.")
    if errs:
        emit(f"- misfit magnitude (dekacal): median {np.median(errs):.0f}, "
             f"max {max(errs)}")
    ps = CE.LAST_PROJECT_SUMMARY
    if ps:
        emit(f"- null-space projection toward the published tables "
             f"(tools/calibrate_energy.project_to_prior): of "
             f"|theta-prior|_1 = {ps['dist0']} dekacal across the fitted "
             f"keys, only {ps['dist0'] - ps['dist1']} can move toward the "
             f"prior without breaking an exact train row — the train "
             f"corpus pins its observed keys essentially uniquely, and "
             f"the direction the held-out rows pull is *not* toward the "
             f"published values.  The residual {mis - mis_unseen} "
             f"misfit rows use only train-pinned keys: ViennaRNA's "
             f"actual table differs from the published priors in "
             f"directions only the 200n rows witness (the full-corpus "
             f"fit, which sees them, is exact on {ok_f}/{n}).")
    emit(f"- risk surface: {len(train_keys)} distinct table keys observed "
         f"in train, {len(all_keys)} in the full corpus; every other "
         f"entry of the free tables is fold-reachable but non-corpus-"
         f"pinned and evaluates at its published Turner-2004 value.")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"\nwrote {OUT}")


if __name__ == "__main__":
    main()
