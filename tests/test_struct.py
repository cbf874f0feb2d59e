from rafft_tpu.struct import (dot_bracket, paired_positions, pair_table,
                              merge_pair_list, parse_rafft_output)


def test_dot_bracket_roundtrip():
    db = "((..((...))..))..(((...)))"
    pairs = paired_positions(db)
    assert dot_bracket(pairs, len(db)) == db


def test_paired_positions_order():
    # closing-bracket order, as the reference emits
    assert paired_positions("(())") == [(1, 2), (0, 3)]
    assert paired_positions("([)]") == [(0, 2), (1, 3)]


def test_pair_table():
    assert pair_table("(.)") == [2, -1, 0]
    assert pair_table([(0, 2)], 3) == [2, -1, 0]


def test_merge_pair_list():
    a = [(1, 2)]
    merge_pair_list(a, [(1, 2), (3, 4)])
    assert a == [(1, 2), (3, 4)]


def test_parse_rafft_output(tmp_path):
    p = tmp_path / "r.out"
    p.write_text("ACGU\n# ---0---\n....    0.0\n# ---1---\n(..)   -1.0\n")
    steps, seq = parse_rafft_output(str(p))
    assert seq == "ACGU"
    assert len(steps) == 2
    assert steps[1][0].str_struct == "(..)"
    assert steps[1][0].energy == -1.0
