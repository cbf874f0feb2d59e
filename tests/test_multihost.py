"""Multi-controller runtime: 2 localhost processes over the GRPC
coordination service (SURVEY §2.3 multi-host capability)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys, os
    sys.path.insert(0, %r)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from rafft_tpu.parallel.distributed import init_multihost, \
        shard_records, global_mean
    coord, pid = sys.argv[1], int(sys.argv[2])
    p, n, ld, gd = init_multihost(coord, 2, pid)
    assert n == 2, n
    assert len(gd) == 2 * len(ld), (len(gd), len(ld))
    recs = shard_records(list(range(10)), p, n)
    assert len(recs) == 5
    # per-host means 1.0 / 3.0 with counts 1 / 3 -> global 2.5
    m = global_mean(1.0 if p == 0 else 3.0, 1 if p == 0 else 3)
    assert abs(m - 2.5) < 1e-9, m
    print("OK", p, flush=True)
""" % ROOT)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_runtime(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)   # no virtual-device split in workers
    procs = [subprocess.Popen(
        [sys.executable, str(w), coord, str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            # a coordination hang is a regression, not an environment
            # quirk — fail loudly (VERDICT r3 weak-6)
            pytest.fail("distributed coordination service timed out "
                        "after 240s — the multi-host runtime is broken "
                        "or the GRPC service cannot bind on localhost")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, (rc, out[-500:], err[-2000:])
        assert "OK" in out


def test_merge_parts_ok(tmp_path):
    from rafft_tpu.parallel.distributed import merge_parts

    header = "a,b\n"
    out = tmp_path / "merged.csv"
    for p, rows in enumerate((["1,2\n"], ["3,4\n", "5,6\n"])):
        with open(f"{out}.part{p}", "w") as fh:
            fh.write(header)
            fh.writelines(rows)
            fh.write("#done\n")
    n = merge_parts(str(out), 2, header, timeout_s=5)
    assert n == 3
    assert out.read_text() == "a,b\n1,2\n3,4\n5,6\n"


def test_merge_parts_dead_host_diagnosis(tmp_path):
    """A missing and an unfinished part must produce a PartTimeout
    naming both — not an hour-long hang (VERDICT r3 weak-6)."""
    import time

    from rafft_tpu.parallel.distributed import PartTimeout, merge_parts

    header = "a,b\n"
    out = tmp_path / "merged.csv"
    with open(f"{out}.part0", "w") as fh:       # unfinished: no #done
        fh.write(header + "1,2\n")
    # part1 never appears
    t0 = time.monotonic()
    with pytest.raises(PartTimeout) as ei:
        merge_parts(str(out), 2, header, timeout_s=1.5, poll_s=0.1)
    assert time.monotonic() - t0 < 10
    msg = str(ei.value)
    assert f"{out}.part1" in msg and f"{out}.part0" in msg
