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
    # Portable flags only (no -march=native): the .so lands in the package
    # tree and may be shared/copied across hosts — a host-tuned build would
    # SIGILL on an older CPU instead of falling back to the Python codecs.
    # Compile to a per-process temp name and os.replace so concurrent
    # first-use autobuilds never interleave writes into one corrupt file.
    tmp = f"{OUT}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC",
        "-o", tmp, os.path.join(HERE, "tiffcodec.cpp"),
    ]
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, OUT)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return OUT


if __name__ == "__main__":
    print(build())
    sys.exit(0)
