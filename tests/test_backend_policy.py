"""Auto-backend fallback policy and profiler trace accounting."""

import gzip
import json

import pytest

from falcon_r1cs_tpu.witness.engine import auto_backend


def test_auto_backend_falls_back_only_on_unavailability():
    calls = []

    def build(use_pallas):
        def run(x):
            calls.append(use_pallas)
            if use_pallas:
                raise ValueError(
                    "Only interpret mode is supported on CPU backend."
                )
            return x + 1

        return run

    fn = auto_backend(build)
    with pytest.warns(RuntimeWarning, match="falling"):
        assert fn(1) == 2
    assert calls == [True, False]
    assert fn(5) == 6  # stays on fallback without re-trying


def test_auto_backend_propagates_real_errors():
    def build(use_pallas):
        def run(x):
            if use_pallas:
                raise ValueError("RESOURCE_EXHAUSTED: out of memory")
            return x

        return run

    fn = auto_backend(build)
    with pytest.raises(ValueError, match="RESOURCE_EXHAUSTED"):
        fn(1)


def test_device_time_trace_accounting(tmp_path):
    """Only the "XLA Ops" row is summed; the equal-total "XLA Modules" row
    must NOT double the result."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import device_time_us_from_trace

    events = [
        {"ph": "M", "name": "process_name", "pid": 7,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "thread_name", "pid": 7, "tid": 1,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 7, "tid": 2,
         "args": {"name": "XLA Ops"}},
        # module-row total deliberately DIFFERENT from the ops-row total so
        # the assertion discriminates which row was summed
        {"ph": "X", "pid": 7, "tid": 1, "dur": 1300, "name": "module"},
        {"ph": "X", "pid": 7, "tid": 2, "dur": 600, "name": "fusion.1"},
        {"ph": "X", "pid": 7, "tid": 2, "dur": 400, "name": "fusion.2"},
        # host events must be excluded entirely
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 1, "tid": 9, "dur": 99999, "name": "python"},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    assert device_time_us_from_trace(str(tmp_path)) == 1000
