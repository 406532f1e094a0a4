"""Runtime tactic autotuner.

Reference parity: flashinfer/autotuner.py — ``AutoTuner.choose_one`` (:349)
profiles each tactic of a ``TunableRunner`` with device timing, caches the
winner per (op, shape-bucket) key, and persists chosen configs;
``autotune()`` (:251) is the context manager that switches profiling on.

TPU mapping: a "tactic" is a kernel meta-parameter set (tile_k / tile_q /
block shapes) rather than a prebuilt cubin; timing uses the differential
scan bencher (testing/utils.py) so tunnel dispatch latency cannot distort
choices; the persisted config file lives under FLASHINFER_TPU_CACHE_DIR.
Outside an ``autotune()`` region, ``choose_one`` returns the cached winner
(or the first tactic) without profiling — the same fallback contract as the
reference (autotuner.py:400).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence

from flashinfer_tpu.jit.env import CACHE_DIR, logger

__all__ = ["AutoTuner", "TunableRunner", "autotune", "get_config_path"]


def get_config_path() -> str:
    """Persisted tuner configs (reference autotuner.py:26)."""
    return str(CACHE_DIR / "autotuner_configs.json")


class TunableRunner:
    """A tunable op: enumerate tactics and run one
    (reference TunableRunner protocol, autotuner.py:120)."""

    def get_valid_tactics(self) -> Sequence[Any]:
        raise NotImplementedError

    def run(self, tactic: Any, *args):
        raise NotImplementedError


@dataclasses.dataclass
class _Stats:
    tuned_ops: int = 0
    profiled_tactics: int = 0
    cache_hits: int = 0


class AutoTuner:
    """Singleton tactic selector (reference AutoTuner, autotuner.py:200)."""

    _instance: Optional["AutoTuner"] = None
    _lock = threading.Lock()

    def __init__(self):
        self.enabled = False
        self._cache: Dict[str, Any] = {}
        self.stats = _Stats()
        self._loaded = False

    @classmethod
    def get(cls) -> "AutoTuner":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    # -- persistence --------------------------------------------------------

    def _load(self):
        if self._loaded:
            return
        self._loaded = True
        path = get_config_path()
        if os.path.exists(path):
            try:
                with open(path) as f:
                    self._cache.update(json.load(f))
            except Exception as e:  # noqa: BLE001
                logger.warning("autotuner config load failed: %s", e)

    def _save(self):
        path = get_config_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self._cache, f, indent=1, default=str)

    # -- core ---------------------------------------------------------------

    def cached(self, op_key: str, tactics: Sequence[Any]) -> Optional[Any]:
        """Return the persisted winner for op_key if it is still a valid
        tactic, else None. Pure host lookup — safe to call at trace time
        (kernel call sites consult this on every run; profiling only
        happens through choose_one on eager values)."""
        self._load()
        cached = self._cache.get(op_key)
        if cached is not None:
            for t in tactics:
                if _tactic_key(t) == cached:
                    self.stats.cache_hits += 1
                    return t
        return None

    def choose_one(
        self,
        op_key: str,
        runner: TunableRunner,
        *args,
        time_tactic: Optional[Callable[[Any], float]] = None,
    ) -> Any:
        """Return the best tactic for op_key. Profiles only inside an
        ``autotune()`` region; otherwise returns the cached winner or the
        first valid tactic."""
        self._load()
        tactics = list(runner.get_valid_tactics())
        if not tactics:
            raise ValueError(f"{op_key}: no valid tactics")
        cached = self.cached(op_key, tactics)
        if cached is not None:
            return cached
        if not self.enabled:
            return tactics[0]

        import numpy as np

        from flashinfer_tpu.testing.utils import bench_tpu_time

        best, best_t = None, float("inf")
        for tactic in tactics:
            try:
                if time_tactic is not None:
                    dt = time_tactic(tactic)
                else:
                    dt = bench_tpu_time(
                        lambda *a: runner.run(tactic, *a), *args,
                        warmup=2, repeats=5, reducer="min",
                    )
            except Exception as e:  # noqa: BLE001 — invalid tactic on this hw
                logger.info("%s: tactic %s failed (%s)", op_key, tactic, e)
                continue
            self.stats.profiled_tactics += 1
            if dt < best_t:
                best, best_t = tactic, dt
        if best is None:
            raise RuntimeError(f"{op_key}: every tactic failed")
        self._cache[op_key] = _tactic_key(best)
        self.stats.tuned_ops += 1
        self._save()
        return best


def _tactic_key(t: Any) -> str:
    return json.dumps(t, sort_keys=True, default=str)


@contextlib.contextmanager
def autotune(enable: bool = True):
    """Enable tactic profiling within the region
    (reference autotune(), autotuner.py:251)."""
    tuner = AutoTuner.get()
    prev = tuner.enabled
    tuner.enabled = enable
    try:
        yield tuner
    finally:
        tuner.enabled = prev
