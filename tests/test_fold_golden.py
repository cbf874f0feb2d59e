"""Golden-file parity: the CPU engine must reproduce the reference's
example outputs byte-for-byte through the CLI text protocol
(/root/reference/example/rafft.out, README commands)."""

import io
import contextlib

import pytest

from tests.conftest import reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference checkout")


def run_cli(argv):
    from rafft_tpu.cli.fold_cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    return buf.getvalue()


@needs_ref
def test_rafft_out_byte_exact():
    golden = open("/root/reference/example/rafft.out").read()
    seq = golden.splitlines()[0]
    out = run_cli(["-s", seq, "-ms", "5", "--traj"])
    assert out == golden


@needs_ref
@pytest.mark.slow
def test_rafft_20_byte_exact():
    golden = open("/root/reference/example/rafft_20.out").read()
    seq = golden.splitlines()[0]
    out = run_cli(["-s", seq, "-ms", "20", "--traj"])
    assert out == golden


@needs_ref
def test_bench_output_format():
    seq = "GGGGGAAAACCCCC"
    out = run_cli(["-s", seq, "--bench"])
    parts = out.strip().split()
    assert parts[0] == seq
    assert parts[1] == str(len(seq))
    assert parts[4] == parts[2].count("(") and len(parts) == 5 or len(parts) == 5
