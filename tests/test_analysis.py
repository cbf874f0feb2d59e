from rafft_tpu.analysis import (shapiro, loop_content, ct_to_db, write_ct,
                                parse_ct, loop_entropy)
from rafft_tpu.viz.layout import layout, structure_svg
from rafft_tpu.viz.surface import bp_distance


def test_shapiro_basic():
    assert shapiro("((((...))))") == "(R(S(H)))"
    assert shapiro("((..((...))..((...))..))") == "(R(S(M(S(H))(S(H)))))"
    assert shapiro("((..((...))))") == "(R(S(B(S(H)))))"
    assert shapiro("((..((...))..))") == "(R(S(I(S(H)))))"


def test_loop_entropy_positive():
    e = loop_entropy(["((((...))))", "((..((...))..((...))..))"])
    assert e > 0


def test_ct_roundtrip(tmp_path):
    seq = "GGGAAACCC"
    db = "(((...)))"
    p = tmp_path / "x.ct"
    write_ct(db, seq, str(p), "x")
    seq2, pairs = parse_ct(str(p))
    assert seq2 == seq
    seq3, db2 = ct_to_db(str(p))
    assert db2 == db


def test_layout_shapes():
    db = "((((...))))..((...))"
    xy = layout(db)
    assert xy.shape == (len(db), 2)
    svg = structure_svg("G" * len(db), db)
    assert svg.startswith("<svg") and "line" in svg


def test_bp_distance():
    assert bp_distance("((..))", "((..))") == 0
    assert bp_distance("((..))", "(....)") == 1
