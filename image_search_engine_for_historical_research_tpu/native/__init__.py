"""Native (C++) runtime components, loaded via ctypes.

The reference leans on FAISS/Annoy/OpenCV C++ for its hot host-side paths; the
first-party native layer here covers the genuinely serial, pointer-chasing work
that neither XLA nor numpy does well — currently the HNSW graph builder. Shared
objects are compiled on first use into ``native/_build`` and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_DIR, "_build")

_SOURCES = {
    "hnsw": ["hnsw_build.cpp"],
    "image_loader": ["image_loader.cpp"],
}

_LINK_FLAGS = {
    "image_loader": ["-ljpeg"],
}

_libs = {}


def _compile(name: str) -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in _SOURCES[name]]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= newest_src:
        return so_path
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", so_path, *srcs, *_LINK_FLAGS.get(name, []),
    ]
    # -march=native when available (not critical)
    try:
        subprocess.run(cmd + ["-march=native"], check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def load(name: str) -> ctypes.CDLL:
    """Compile (if needed) and load a native library by short name."""
    if name not in _libs:
        _libs[name] = ctypes.CDLL(_compile(name))
    return _libs[name]
