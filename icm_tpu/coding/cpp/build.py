"""Build the native rANS shared library with g++.

No pybind11 in this environment — the module exposes a plain C ABI driven
via ctypes (zero-copy numpy arrays). Usage: ``python -m
icm_tpu.coding.cpp.build`` or just import ``icm_tpu.coding`` (auto-builds
on first use if g++ is available).
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "rans.cpp")
LIB = os.path.join(_DIR, "librans.so")


def build(force: bool = False) -> str | None:
    """Compile if needed; returns lib path or None on failure."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    debug = bool(os.environ.get("DEBUG_BUILD"))
    opt = ["-O0", "-g", "-UNDEBUG"] if debug else ["-O3"]
    cmd = [
        "g++",
        *opt,
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        LIB,
        SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"[icm_tpu.coding] native build failed: {msg}", file=sys.stderr)
        return None
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path or "BUILD FAILED")
    sys.exit(0 if path else 1)
