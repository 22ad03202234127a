"""Locate the optional C++ helper library (``libps_native.so``).

Search order:
  1. ``PS_NATIVE_LIB`` env var — an absolute path to the built ``.so``
     (the knob a pip-installed package uses, where the repo-relative
     ``native/build/`` tree does not exist).
  2. ``<repo root>/native/build/libps_native.so`` relative to this package
     (the in-tree dev layout; built by ``make -C native``).

Returns ``None`` when neither exists — callers fall back to the pure-Python
implementations, which tests verify equivalent (tests/test_spm.py,
tests/test_audio_io.py).
"""

from __future__ import annotations

import os


def find_native_lib() -> str | None:
    env = os.environ.get("PS_NATIVE_LIB")
    if env:
        return env if os.path.exists(env) else None
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(root, "native", "build", "libps_native.so")
    return cand if os.path.exists(cand) else None
