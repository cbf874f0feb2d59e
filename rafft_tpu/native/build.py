"""Build the native Turner evaluator shared library.

Usage: python rafft_tpu/native/build.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "turner_eval.cpp")
LIB = os.path.join(HERE, "libturner.so")


def build(force=False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", LIB, SRC]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
