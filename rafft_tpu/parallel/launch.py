"""Localhost multi-process launcher for the multi-host sweep.

Spawns N controller processes on this machine (each a full JAX
multi-controller participant over the GRPC coordination service) and
runs the sweep CLI in every one.  On a real pod each host runs the
same command with its own --process_id; this launcher is the
single-machine stand-in (CPU backend) used by tests and CI.

    python -m rafft_tpu.parallel.launch --num_processes 2 -- \
        --csv bench.csv --out out.csv -n 100 -ms 50 --limit 8
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(num_processes: int, sweep_args, backend: str = "cpu"):
    port = free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        if backend:
            env["JAX_PLATFORMS"] = backend
        cmd = [sys.executable, "-m", "rafft_tpu.parallel.sweep",
               "--coordinator", coord,
               "--num_processes", str(num_processes),
               "--process_id", str(pid)] + list(sweep_args)
        procs.append(subprocess.Popen(cmd, env=env))
    rc = [p.wait() for p in procs]
    return max(rc)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--backend", default="cpu")
    ap.add_argument("sweep_args", nargs=argparse.REMAINDER,
                    help="arguments after -- go to the sweep CLI")
    args = ap.parse_args(argv)
    sweep_args = args.sweep_args
    if sweep_args and sweep_args[0] == "--":
        sweep_args = sweep_args[1:]
    raise SystemExit(launch(args.num_processes, sweep_args, args.backend))


if __name__ == "__main__":
    main()
