"""Native (C++) components, built lazily on first use.

The compute path stays JAX/XLA/Pallas; these are host-runtime accelerators
where the interpreter would serialize offline work (mesh isosurface extraction
at 256^3 takes ~37 s in numpy on this single-core host vs ~1-2 s native).
Everything here is optional: callers fall back to the numpy implementations if
the toolchain is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
_DIR = os.path.dirname(os.path.abspath(__file__))
_cached = {}


def _so_path(name: str) -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, name + suffix)


def _build(name: str, source: str) -> bool:
    """Compile a single-file CPython extension with g++."""
    import numpy as np

    so = _so_path(name)
    src = os.path.join(_DIR, source)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    py_inc = sysconfig.get_paths()["include"]
    np_inc = np.get_include()
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           f"-I{py_inc}", f"-I{np_inc}", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:
        sys.stderr.write(f"native build of {name} failed: {e}\n")
        return False


def load(name: str = "_marching_native", source: str = "marching.cpp"):
    """Import (building if needed) a native module; None on failure."""
    if name in _cached:
        return _cached[name]
    mod = None
    try:
        if _build(name, source):
            import importlib.util
            spec = importlib.util.spec_from_file_location(name, _so_path(name))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
    except Exception as e:
        sys.stderr.write(f"native load of {name} failed: {e}\n")
        mod = None
    _cached[name] = mod
    return mod
