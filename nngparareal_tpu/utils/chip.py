"""Bounded TPU-health probing.

The axon TPU worker sporadically kernel-faults; after that, backend init
in ANY process blocks ~25 min before raising UNAVAILABLE — far past any
sane gate timeout, and it cannot be interrupted in-process (the hang is
inside C++). So health is probed from a bounded SUBPROCESS, and the probe
must also verify the backend that answered is actually an accelerator:
if the plugin ever fails fast instead of hanging, jax silently falls back
to CPU and a trivial computation would still succeed — which must not be
reported as "chip healthy" (an on-chip benchmark would silently run on
CPU and be published as a TPU number).
"""

import subprocess
import sys

# payload run in a fresh interpreter: asserts a non-CPU default backend
# AND that a computation completes on it
PROBE_SNIPPET = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "assert d and d[0].platform != 'cpu', f'default backend is {d}';"
    "print(float((jnp.ones((8,128))*2.0).sum()))"
)


def chip_healthy(timeout_s=300):
    """True iff a fresh process can run one op on a non-CPU backend
    within ``timeout_s``."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SNIPPET],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False
