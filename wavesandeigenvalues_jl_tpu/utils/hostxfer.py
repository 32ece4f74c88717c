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


def to_device_complex(x: np.ndarray):
    """Ship a host complex array to the default device: transfer the real
    and imaginary planes separately (the axon runtime rejects complex
    buffers) and recombine with lax.complex on device."""
    import jax

    from .config import on_tpu
    x = np.asarray(x)
    rdt = np.float32 if on_tpu() else np.float64
    if not np.iscomplexobj(x):
        return jnp.asarray(x)
    re = jnp.asarray(np.ascontiguousarray(x.real).astype(rdt))
    im = jnp.asarray(np.ascontiguousarray(x.imag).astype(rdt))
    return jax.lax.complex(re, im)


__all__ = ["to_numpy", "to_device_complex"]
