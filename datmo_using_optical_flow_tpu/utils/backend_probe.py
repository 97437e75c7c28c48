"""Outage-tolerant backend initialization for the benchmark harness.

The TPU tunnel this repo benchmarks through is transiently flaky: a single
failed ``jax.devices()`` at capture time zeroed the entire round-3 perf record
(``BENCH_r03.json`` is one traceback).  Every benchmark entry point now
initializes the backend through :func:`init_backend_with_retry` and, on final
failure, emits a PARSEABLE result line via :func:`emit_unavailable` instead of
dying with a traceback — so a transient outage degrades to a recorded
"tunnel_down" data point rather than an empty round.
"""

from __future__ import annotations

import json
import sys
import time


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def init_backend_with_retry(attempts: int = 5, sleep_s: float = 60.0):
    """Initialize the JAX backend, retrying transient failures.

    Returns the device list on success, ``None`` after ``attempts`` failures.
    Each attempt that raises (TPU tunnel down, backend setup error) sleeps
    ``sleep_s`` and retries; jax caches a FAILED backend init, so retries go
    through ``jax.extend.backend.clear_backends`` when available.
    """
    import jax

    last = None
    for attempt in range(1, attempts + 1):
        try:
            devs = jax.devices()
            _log(f"backend up (attempt {attempt}): {devs}")
            return devs
        except Exception as e:  # RuntimeError / JaxRuntimeError etc.
            last = e
            _log(f"backend init failed (attempt {attempt}/{attempts}): "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                pass
            if attempt < attempts:
                time.sleep(sleep_s)
    _log(f"backend unavailable after {attempts} attempts: {last}")
    return None


def guard_main(main_fn, metric: str, unit: str,
               attempts: int = 5, sleep_s: float = 60.0) -> None:
    """Run a benchmark ``main`` only if the backend comes up; otherwise emit
    the parseable unavailable line and return cleanly (exit code 0, so suite
    drivers record the outage instead of a crash)."""
    if init_backend_with_retry(attempts, sleep_s) is None:
        emit_unavailable(metric, unit)
        return
    main_fn()


def emit_unavailable(metric: str, unit: str, error: str = "tunnel_down") -> None:
    """Print the one-line JSON result recording an unavailable backend."""
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": unit,
        "vs_baseline": None,
        "error": error,
    }))
