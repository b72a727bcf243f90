"""Observability aux subsystem (SURVEY §5.1/§5.5)."""

import json
import os

import numpy as np

from jampack_tpu.runtime.engines import NativeEngine
from jampack_tpu.runtime.metrics import InstrumentedEngine, device_trace


def test_instrumented_engine_collects_per_stage_metrics():
    eng = InstrumentedEngine(NativeEngine())
    data = np.frombuffer(b"observability " * 2000, np.uint8)
    s = eng.lz_encode(data, 0)
    s = eng.filters_encode(s, 1)
    summary = eng.metrics.summary()
    assert "lz_encode" in summary and "filters_encode" in summary
    assert summary["lz_encode"]["MB"] > 0
    report = eng.metrics.report()
    assert "lz_encode" in report
    parsed = json.loads(eng.metrics.to_json())
    assert parsed["lz_encode"]["s"] >= 0


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        x = jnp.arange(1024) * 2
        _ = int(x[0])
    found = any(
        name.endswith((".pb", ".json.gz", ".xplane.pb"))
        for _, _, files in os.walk(logdir)
        for name in files
    )
    assert found, "no profiler artifacts written"
