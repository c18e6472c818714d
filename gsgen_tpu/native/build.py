"""On-demand compilation of the native C++ components.

The reference ships CUDA/C++ that is JIT-built through torch's
cpp_extension loader (gs/backend.py:52-66 in gsgen3d/gsgen); this is the
same idea without the torch dependency: g++ -O3 -shared, cached by
source mtime under ``native/_build``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_SRC = Path(__file__).parent / "src"
_BUILD = Path(__file__).parent / "_build"


def build_and_load(name: str) -> ctypes.CDLL:
    src = _SRC / f"{name}.cpp"
    _BUILD.mkdir(exist_ok=True)
    so = _BUILD / f"{name}.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", str(src), "-o", str(so)]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return ctypes.CDLL(str(so))
