"""Wall-clock timing helpers.

The reference instruments everything with time.time() decorators
(reference solver.py:21-27, models.py:28-46). With JAX's async dispatch a
naive wrapper measures dispatch latency, not compute — so these helpers
block on the result before reading the clock.
"""

import time

import jax


def _block(x):
    try:
        return jax.block_until_ready(x)
    except Exception:
        return x


def wall_timed(fn):
    """Wrap fn so it returns (result, seconds), blocking on device work."""

    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = _block(out)
        return out, time.perf_counter() - t0

    return wrapper


class Timer:
    """Accumulating named wall-clock timer."""

    def __init__(self):
        self.totals = {}

    def add(self, name, seconds):
        self.totals[name] = self.totals.get(name, 0.0) + seconds

    def time(self, name, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = _block(out)
        self.add(name, time.perf_counter() - t0)
        return out

    def get(self, name):
        return self.totals.get(name, 0.0)
