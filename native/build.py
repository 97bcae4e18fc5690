#!/usr/bin/env python
"""Build the native sample-sink library (libsampsink.so)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build():
    src = os.path.join(HERE, "sampsink.cpp")
    out = os.path.join(HERE, "libsampsink.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print("built", out)


if __name__ == "__main__":
    sys.exit(build())
