"""Infrastructure layer tests: testing utils, autotuner, CLI, AOT, profiler,
native JIT registry (SURVEY.md §2.4 parity components)."""

import json
import os

import numpy as np
import pytest

import flashinfer_tpu  # noqa: F401 — must import before submodules


def test_attention_flops_causal_half():
    from flashinfer_tpu.testing.utils import attention_flops

    full = attention_flops(
        batch_size=1, qo_len=128, kv_len=128, head_dim_qk=64, head_dim_vo=64,
        num_qo_heads=1, causal=False)
    causal = attention_flops(
        batch_size=1, qo_len=128, kv_len=128, head_dim_qk=64, head_dim_vo=64,
        num_qo_heads=1, causal=True)
    assert causal == pytest.approx(full * (129 / 256), rel=1e-6)


def test_attention_bytes():
    from flashinfer_tpu.testing.utils import attention_bytes

    b = attention_bytes(
        batch_size=2, qo_len=1, kv_len=100, head_dim_qk=64, head_dim_vo=64,
        num_qo_heads=8, num_kv_heads=2, q_itemsize=2, kv_itemsize=2,
        o_itemsize=2)
    want = 2 * (1 * 8 * 64 * 2 + 100 * 2 * 128 * 2 + 1 * 8 * 64 * 2)
    assert b == want


def test_assert_close_mismatch_tolerance():
    from flashinfer_tpu.testing.utils import assert_close_with_mismatch_tolerance

    a = np.zeros(100)
    b = np.zeros(100)
    b[7] = 1.0
    with pytest.raises(AssertionError):
        assert_close_with_mismatch_tolerance(a, b)
    assert_close_with_mismatch_tolerance(a, b, max_mismatched_elements=1)


def test_bench_differential_runs():
    import jax.numpy as jnp

    from flashinfer_tpu.testing.utils import bench_tpu_time_differential

    dt = bench_tpu_time_differential(
        lambda c, w: c * w, jnp.ones((128, 128)), jnp.full((128, 128), 1.0001),
        n_short=1, n_long=3, repeats=2)
    assert dt > 0


def test_autotuner_choose_and_cache(tmp_path, monkeypatch):
    from flashinfer_tpu import autotuner as at

    monkeypatch.setattr(
        at, "get_config_path", lambda: str(tmp_path / "cfg.json"))
    tuner = at.AutoTuner()

    class R(at.TunableRunner):
        def get_valid_tactics(self):
            return [{"tile": 128}, {"tile": 256}, {"tile": 512}]

        def run(self, tactic, *args):
            return tactic

    # disabled: first tactic
    assert tuner.choose_one("op_a", R())["tile"] == 128

    # enabled with an injected timer: picks fastest, persists
    times = {128: 3.0, 256: 1.0, 512: 2.0}
    with at.autotune():
        at.AutoTuner._instance = tuner  # route the ctx flag to our instance
        tuner.enabled = True
        best = tuner.choose_one(
            "op_b", R(), time_tactic=lambda t: times[t["tile"]])
    assert best["tile"] == 256
    assert os.path.exists(tmp_path / "cfg.json")

    # a fresh tuner reads the persisted winner without profiling
    tuner2 = at.AutoTuner()
    assert tuner2.choose_one("op_b", R())["tile"] == 256
    assert tuner2.stats.cache_hits == 1


def test_cli_list_ops(capsys):
    from flashinfer_tpu.__main__ import main

    assert main(["list-ops"]) == 0
    out = capsys.readouterr().out
    assert "BatchDecodeWithPagedKVCacheWrapper" in out


def test_cli_show_config(capsys):
    from flashinfer_tpu.__main__ import main

    assert main(["show-config"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert "planner_backend" in info


def test_aot_warmup_small():
    from flashinfer_tpu.aot import AotConfig, warmup

    n = warmup(universe=[
        AotConfig(name="tiny_decode", op="decode", batch=2, kv_len=64,
                  num_qo_heads=4, num_kv_heads=2, head_dim=64, page_size=16),
        AotConfig(name="sampling", op="sampling", batch=2),
    ])
    assert n == 2


def test_aot_filter():
    from flashinfer_tpu.aot import default_universe, warmup

    names = [c.name for c in default_universe()]
    assert any("decode_h8x2_d128" in n for n in names)
    assert warmup(configs=["no_such_config"]) == 0


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from flashinfer_tpu.profiler import annotate, latest_trace_path, profile_trace

    with profile_trace(str(tmp_path)):
        with annotate("test_span"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    assert latest_trace_path(str(tmp_path)) is not None


def test_jit_registry_stats():
    from flashinfer_tpu.jit import get_native_runtime, jit_registry

    if get_native_runtime() is None:
        pytest.skip("native runtime not buildable")
    stats = jit_registry.get_stats()
    assert "fi_native" in stats
