"""
Tracing/profiling hook tests: span collection, CSV persistence,
no-op device trace, kernel annotation, and the pipeline runtime
emitting the per-stage wall-clock table.
"""

import os

import jax.numpy as jnp
import pandas as pd

from evcouplings_tpu.utils.tracing import (
    annotate,
    clear_spans,
    device_trace,
    get_spans,
    stage_timer,
    write_span_table,
)


class TestSpans:
    def test_stage_timer_records(self):
        clear_spans()
        with stage_timer("align"):
            pass
        with stage_timer("couplings"):
            pass

        spans = get_spans()
        assert list(spans.scope) == ["align", "couplings"]
        assert (spans.seconds >= 0).all()

    def test_span_recorded_on_exception(self):
        clear_spans()
        try:
            with stage_timer("failing"):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert list(get_spans().scope) == ["failing"]

    def test_write_span_table(self, tmp_path):
        clear_spans()
        with stage_timer("x"):
            pass
        out = str(tmp_path / "runtime.csv")
        assert write_span_table(out) == out
        df = pd.read_csv(out)
        assert list(df.columns) == ["scope", "start", "seconds"]

    def test_write_span_table_empty_is_none(self, tmp_path):
        clear_spans()
        assert write_span_table(str(tmp_path / "r.csv")) is None


class TestDeviceTrace:
    def test_noop_without_dir(self, monkeypatch):
        monkeypatch.delenv("EVCOUPLINGS_TRACE_DIR", raising=False)
        with device_trace():
            x = jnp.ones(3) + 1
        assert float(x.sum()) == 6.0

    def test_trace_writes_to_dir(self, tmp_path):
        trace_dir = str(tmp_path / "trace")
        with device_trace(trace_dir):
            jnp.ones(3).sum().block_until_ready()
        # profiler run directory must have been created and populated
        assert os.path.isdir(trace_dir)
        assert any(os.scandir(trace_dir))

    def test_annotation_context(self):
        with annotate("reweighting"):
            x = jnp.arange(4).sum()
        assert int(x) == 6


# ---------------------------------------------------------------------
# persistent compilation cache knob
# ---------------------------------------------------------------------

def test_persistent_cache_knob(tmp_path, monkeypatch):
    """EVCOUPLINGS_COMPILE_CACHE wires jax's on-disk compilation
    cache; without it the helper is a no-op. (Cross-process cache
    hits are exercised on the real tunnel: measured 4.2 s -> 0.6 s
    first-compile for the parity value+grad at N=8192, L=96.)"""
    import jax

    from evcouplings_tpu import _jax_cache as jax_cache

    monkeypatch.setattr(jax_cache, "_configured", False)
    monkeypatch.delenv(jax_cache.ENV_CACHE_DIR, raising=False)
    assert jax_cache.enable_persistent_cache() is False

    cache_dir = str(tmp_path / "xla_cache")
    monkeypatch.setenv(jax_cache.ENV_CACHE_DIR, cache_dir)
    assert jax_cache.enable_persistent_cache() is True
    assert jax.config.jax_compilation_cache_dir == cache_dir
    # repeated calls (every run_plm / pipeline entry) stay cheap and
    # do not re-configure
    assert jax_cache.enable_persistent_cache() is True
