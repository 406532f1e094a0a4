"""Environment/config for the native-code JIT layer.

Reference parity: flashinfer/jit/env.py:25-81 (cache dir layout) and the
env-var config surface listed in SURVEY.md §5 (FLASHINFER_* variables).
On TPU the device kernels are compiled by XLA (with JAX's persistent
compilation cache); this layer only covers *host-side native components*
(the C++ planner/page-pool runtime), so the knob set is much smaller.

Environment variables:
  FLASHINFER_TPU_CACHE_DIR   — root cache dir (default ~/.cache/flashinfer_tpu)
  FLASHINFER_TPU_CXX         — C++ compiler (default g++)
  FLASHINFER_TPU_CXXFLAGS    — extra compile flags
  FLASHINFER_TPU_PLANNER     — "native" | "numpy" | "auto" (default auto)
  FLASHINFER_TPU_LOG_LEVEL   — python logging level name (default WARNING)
  FLASHINFER_TPU_INTERPRET   — force Pallas interpret mode ("1"/"0")
"""

from __future__ import annotations

import logging
import os
import pathlib

__all__ = [
    "CACHE_DIR",
    "NATIVE_BUILD_DIR",
    "CSRC_DIR",
    "cxx",
    "cxxflags",
    "planner_backend",
    "logger",
]

CACHE_DIR = pathlib.Path(
    os.environ.get(
        "FLASHINFER_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "flashinfer_tpu"),
    )
)
NATIVE_BUILD_DIR = CACHE_DIR / "native"
CSRC_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"


def cxx() -> str:
    return os.environ.get("FLASHINFER_TPU_CXX", "g++")


def cxxflags() -> list[str]:
    base = ["-O3", "-std=c++17", "-fPIC", "-shared", "-Wall"]
    extra = os.environ.get("FLASHINFER_TPU_CXXFLAGS", "")
    return base + ([f for f in extra.split() if f] if extra else [])


def planner_backend() -> str:
    v = os.environ.get("FLASHINFER_TPU_PLANNER", "auto").lower()
    if v not in ("native", "numpy", "auto"):
        raise ValueError(f"FLASHINFER_TPU_PLANNER={v!r} not in native|numpy|auto")
    return v


def _make_logger() -> logging.Logger:
    log = logging.getLogger("flashinfer_tpu")
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s [flashinfer_tpu] %(levelname)s %(message)s")
        )
        log.addHandler(handler)
    log.setLevel(os.environ.get("FLASHINFER_TPU_LOG_LEVEL", "WARNING").upper())
    return log


logger = _make_logger()
