"""Device→host transfer helpers for restricted TPU runtimes.

Two axon-runtime quirks are worked around here: complex arrays cannot
cross the host↔device boundary at all (ship/fetch real+imag planes), and
buffers produced directly by pallas_call hang on transfer (fetch through a
trivial XLA copy)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_numpy(x) -> np.ndarray:
    """np.asarray that survives complex dtypes and pallas output buffers."""
    if isinstance(x, np.ndarray):
        return x
    x = jnp.add(x, 0)  # detach from pallas output buffer
    if jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


__all__ = ["to_numpy"]
