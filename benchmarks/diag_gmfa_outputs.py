"""Follow-up to diag_gmfa_step: the full-step program costs +1117 ms over the
prefix that already contains ALL its compute (prefix..kf = 454 ms, FULL =
1572 ms), and the only difference is ~10 trivial elementwise ops plus the
RETURN of the full (carry, outputs) tree (~15 leaves, ~4 MB).

Hypothesis: per-output materialization cost on the tunneled backend.
Probes trivial programs returning trees of increasing leaf count/size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec
    _ec()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    tiny = jax.jit(lambda a: a + 1.0)
    _ = float(tiny(jnp.float32(1)))
    rts = []
    for _i in range(5):
        t0 = time.time()
        _ = float(tiny(jnp.float32(1)))
        rts.append((time.time() - t0) * 1000)
    rt = min(rts)
    print(f"roundtrip: {rt:.1f} ms", file=sys.stderr)

    results = {}

    def timeit(f, *a, label=""):
        r = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        best = float("inf")
        for _i in range(3):
            t0 = time.time()
            r = f(*a)
            _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
            best = min(best, (time.time() - t0) * 1000)
        v = max(best - rt, 0.0)
        results[label] = round(v, 2)
        print(f"  {label:50s} {v:9.2f} ms", file=sys.stderr, flush=True)

    p = 102400
    big = jnp.ones((p, 3), jnp.float32)
    order = jnp.arange(p, dtype=jnp.int32)
    som = jnp.ones((200, 200), jnp.float32)

    timeit(jax.jit(lambda x: x + 1.0), big, label="1 output (102400x3)")
    timeit(jax.jit(lambda x: (x + 1.0, x + 2.0, x * 2.0)), big,
           label="3 outputs (102400x3 each)")
    timeit(jax.jit(lambda x, o, s: (x + 1.0, x + 2.0, o + 1, o + 2, s + 1.0,
                                    x[:, 0] + 1.0, x[:, 0] * 2.0,
                                    (o > 0), (o > 1), s * 2.0,
                                    x * 3.0, o * 3, x[:16384] + 1.0,
                                    x[:64, 0], o[:64])),
           big, order, som, label="15 outputs (GMFA-carry-like mix)")

    # feed-back loop: 3 chained calls, one sync (the bench_gmfa pattern)
    f15 = jax.jit(lambda x, o: (x + 1.0, o + 1))
    x, o = f15(big, order)
    t0 = time.time()
    for _i in range(3):
        x, o = f15(x, o)
    _ = float(jnp.sum(x))
    v = (time.time() - t0) * 1000 / 3
    results["chained feedback (2 outputs)"] = round(v, 2)
    print(f"  chained feedback (2 outputs)/call: {v:.2f} ms", file=sys.stderr)

    print(json.dumps({"metric": "diag_gmfa_outputs", "value": results.get(
        "15 outputs (GMFA-carry-like mix)"), "unit": "ms", "stages": results}))


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_gmfa_outputs", unit="ms")
