"""Native (C++) runtime components.

Builds on first import via the system toolchain (g++); all users are optional
fast paths with pure-Python fallbacks, so a missing compiler never blocks the
framework.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "../../native/motion_cache.cpp")
_SO = os.path.join(_HERE, "_motion_cache.so")

_motion_cache = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_motion_cache():
    """Import (building if needed) the _motion_cache extension, or None."""
    global _motion_cache
    if _motion_cache is not None:
        return _motion_cache
    need_build = not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    )
    if need_build and not _build():
        return None
    sys.path.insert(0, _HERE)
    try:
        import _motion_cache  # type: ignore

        _motion_cache = _motion_cache
        return _motion_cache
    except ImportError:
        return None
    finally:
        sys.path.pop(0)
