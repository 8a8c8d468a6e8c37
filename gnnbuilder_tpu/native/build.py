"""Build the native packing library: ``python -m gnnbuilder_tpu.native.build``.

Compiles packing.cpp with g++ into libgnnb_packing.so next to this module.
The loader (lib.py) also invokes :func:`build` lazily on first use when the
shared library is missing but a toolchain is present, so normal users never
run this by hand.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "packing.cpp")


def _so_path() -> str:
    from gnnbuilder_tpu.native.lib import _SO_PATH

    return _SO_PATH


def build(verbose: bool = True) -> bool:
    """Compile packing.cpp -> libgnnb_packing.so.  Returns True on success."""
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None or not os.path.exists(SRC):
        return False
    SO_PATH = _so_path()
    cmd = [
        gxx,
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        SRC,
        "-o",
        SO_PATH + ".tmp",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        # -march=native can be unsupported in some sandboxes; retry without
        cmd.remove("-march=native")
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=120
            )
        except (OSError, subprocess.TimeoutExpired):
            return False
        if proc.returncode != 0:
            if verbose:
                print(proc.stderr, file=sys.stderr)
            return False
    os.replace(SO_PATH + ".tmp", SO_PATH)
    # clean superseded ABI versions
    for f in os.listdir(_HERE):
        if (
            f.startswith("libgnnb_packing")
            and f.endswith(".so")
            and os.path.join(_HERE, f) != SO_PATH
        ):
            try:
                os.remove(os.path.join(_HERE, f))
            except OSError:
                pass
    if verbose:
        print(f"built {SO_PATH}")
    return True


if __name__ == "__main__":
    ok = build(verbose=True)
    sys.exit(0 if ok else 1)
