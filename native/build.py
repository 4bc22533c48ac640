"""Build the native codec library (no pybind11; plain C ABI + ctypes).

Usage: ``python native/build.py`` — writes
``unmicst_tpu/io/libunmicst_tiffcodec.so``.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(
    os.path.dirname(HERE), "unmicst_tpu", "io", "libunmicst_tiffcodec.so"
)


def build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", OUT, os.path.join(HERE, "tiffcodec.cpp"),
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build())
    sys.exit(0)
