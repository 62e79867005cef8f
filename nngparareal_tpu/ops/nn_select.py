"""Nearest-neighbour dataset selection on device.

The reference picks, for every prediction query, the m nearest rows of the
accumulated (state, defect) dataset by squared euclidean distance using
scipy cdist + argsort on the host (reference models.py:171-183). Here the
dataset lives in a fixed-capacity padded device buffer and selection is a
masked distance computation + ``lax.top_k`` — O(CAP) with static shapes,
fusable into the surrounding sweep kernel.
"""

import jax.numpy as jnp
from jax import lax


def nearest_neighbors(query, X, valid, m):
    """Indices of the m nearest valid rows of X to ``query``.

    query: (d,), X: (CAP, d), valid: (CAP,) bool/float, m: static int.
    Returns (idx (m,), sqd (m,)) nearest-first; invalid rows never win
    (their distance is +inf). If fewer than m rows are valid the trailing
    indices point at +inf rows — callers must mask with ``sqd < inf``.
    """
    diff = X - query[None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(valid > 0, d2, jnp.inf)
    neg, idx = lax.top_k(-d2, m)
    return idx, -neg
