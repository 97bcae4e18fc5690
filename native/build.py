#!/usr/bin/env python
"""Build the native runtime libraries (libsampsink.so, libbedreader.so)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

LIBS = {
    "sampsink": [],
    "bedreader": ["-pthread"],
}


def build(only=None):
    for name, extra in LIBS.items():
        if only and name != only:
            continue
        src = os.path.join(HERE, f"{name}.cpp")
        out = os.path.join(HERE, f"lib{name}.so")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", out] + extra
        print(" ".join(cmd))
        subprocess.check_call(cmd)
        print("built", out)


if __name__ == "__main__":
    sys.exit(build(sys.argv[1] if len(sys.argv) > 1 else None))
