"""Build the native CPU engine shared library.

Usage: python -m superman_tpu.native.build
The library is also built lazily on first use (bindings/native.py).
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "perman_cpu.cpp")
LIB = os.path.join(os.path.dirname(__file__), "libsuperman_cpu.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-fopenmp",
           "-shared", "-fPIC", SRC, "-o", LIB]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
