"""Build the native oracle shared library with g++."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "oracle.cpp")
LIB = os.path.join(_DIR, "liboracle.so")


def build(force: bool = False) -> str:
    """Compile oracle.cpp → liboracle.so (idempotent)."""
    if not force and os.path.exists(LIB) and (
        os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", SRC, "-o", LIB],
        check=True,
    )
    return LIB


if __name__ == "__main__":
    print(build(force=True))
