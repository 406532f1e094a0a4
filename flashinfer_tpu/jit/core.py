"""Native-code JIT: compile host-side C++ components on demand, cache on disk.

Reference parity: flashinfer/jit/core.py — ``JitSpec`` (:174),
``build_and_load`` (:250), file-lock-guarded builds (:239-262) and the
``JitSpecRegistry`` (:110-170).  The reference renders CUDA from Jinja and
compiles with nvcc via ninja; here the *device* side is Pallas (traced
Python — JAX tracing replaces Jinja+nvcc entirely, SURVEY.md §7), so this
layer only builds host-side native runtime components with the system C++
compiler.  Builds are keyed on a content hash of sources+flags, cached under
FLASHINFER_TPU_CACHE_DIR, and guarded by an O_EXCL lock file so concurrent
processes build once.
"""

from __future__ import annotations

import ctypes
import dataclasses
import hashlib
import os
import subprocess
import time
from typing import Dict, List, Optional, Sequence

from flashinfer_tpu.jit.env import (
    CSRC_DIR,
    NATIVE_BUILD_DIR,
    cxx,
    cxxflags,
    logger,
)

__all__ = [
    "JitSpec",
    "build_and_load",
    "get_native_runtime",
    "jit_registry",
    "clear_cache",
]


@dataclasses.dataclass
class JitSpec:
    """A native build unit: name + source files + flags (jit/core.py:174)."""

    name: str
    sources: Sequence[str]  # paths relative to csrc/ (or absolute)
    flags: Sequence[str] = ()

    def source_paths(self) -> List[str]:
        out = []
        for s in self.sources:
            p = s if os.path.isabs(s) else str(CSRC_DIR / s)
            out.append(p)
        return out

    def content_hash(self) -> str:
        h = hashlib.sha256()
        h.update(" ".join(list(self.flags) + cxxflags()).encode())
        # include every header in csrc/: planner.cc/page_pool.cc both include
        # fi_native.h (struct layouts + ABI constant), and a header-only edit
        # must invalidate the cached .so — a stale .so with a changed struct
        # layout is silent ctypes memory corruption
        headers = sorted(str(p) for p in CSRC_DIR.glob("*.h"))
        for p in list(self.source_paths()) + headers:
            with open(p, "rb") as f:
                h.update(f.read())
        return h.hexdigest()[:16]

    @property
    def lib_path(self) -> str:
        return str(NATIVE_BUILD_DIR / f"{self.name}-{self.content_hash()}.so")


class _Registry:
    """Build/load bookkeeping (reference JitSpecRegistry, jit/core.py:110)."""

    def __init__(self):
        self.specs: Dict[str, JitSpec] = {}
        self.stats: Dict[str, dict] = {}

    def record(self, spec: JitSpec, built: bool, seconds: float):
        self.specs[spec.name] = spec
        self.stats[spec.name] = {
            "lib": spec.lib_path,
            "compiled_this_process": built,
            "build_seconds": round(seconds, 3),
        }

    def get_stats(self) -> Dict[str, dict]:
        return dict(self.stats)


jit_registry = _Registry()


def _locked_build(spec: JitSpec, lib: str) -> None:
    lock = lib + ".lock"
    os.makedirs(NATIVE_BUILD_DIR, exist_ok=True)
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            # another process is building; wait for it (stale after 120s)
            try:
                if time.time() - os.path.getmtime(lock) > 120:
                    os.unlink(lock)
                    continue
            except FileNotFoundError:
                continue
            time.sleep(0.1)
            if os.path.exists(lib):
                return
    try:
        if os.path.exists(lib):
            return
        cmd = (
            [cxx()]
            + cxxflags()
            + list(spec.flags)
            + ["-I", str(CSRC_DIR)]
            + spec.source_paths()
            + ["-o", lib + ".tmp"]
        )
        logger.info("building native module %s: %s", spec.name, " ".join(cmd))
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(
                f"native build of {spec.name} failed:\n{res.stderr}"
            )
        os.replace(lib + ".tmp", lib)
    finally:
        os.close(fd)
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def build_and_load(spec: JitSpec) -> ctypes.CDLL:
    """Compile (if not cached) and dlopen a native module
    (reference build_and_load, jit/core.py:250)."""
    lib = spec.lib_path
    built = False
    t0 = time.time()
    if not os.path.exists(lib):
        _locked_build(spec, lib)
        built = True
    jit_registry.record(spec, built, time.time() - t0)
    return ctypes.CDLL(lib)


def clear_cache() -> int:
    """Remove all cached native builds; returns number of files removed."""
    n = 0
    if NATIVE_BUILD_DIR.exists():
        for p in NATIVE_BUILD_DIR.iterdir():
            p.unlink()
            n += 1
    return n


_runtime: Optional[ctypes.CDLL] = None
_runtime_failed: Optional[str] = None

_NATIVE_RUNTIME_SPEC = JitSpec(
    name="fi_native",
    sources=("planner.cc", "page_pool.cc"),
)

_ABI_VERSION = 4


def get_native_runtime() -> Optional[ctypes.CDLL]:
    """The framework's native host runtime (planner + page pool), or None if
    it cannot be built on this machine (pure-Python fallbacks take over)."""
    global _runtime, _runtime_failed
    if _runtime is not None:
        return _runtime
    if _runtime_failed is not None:
        return None
    try:
        lib = build_and_load(_NATIVE_RUNTIME_SPEC)
        lib.fi_native_abi_version.restype = ctypes.c_int64
        got = lib.fi_native_abi_version()
        if got != _ABI_VERSION:
            raise RuntimeError(f"native ABI {got} != expected {_ABI_VERSION}")
        _runtime = lib
        return lib
    except Exception as e:  # noqa: BLE001 — any failure means fallback
        _runtime_failed = str(e)
        logger.warning("native runtime unavailable (%s); using NumPy planner", e)
        return None
