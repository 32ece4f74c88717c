"""Round-4 probe B: Mosaic gather variants + realistic VPU rate.

take_along_axis with matching-shape indices is the documented Mosaic
gather form; test which shapes lower, and a one-hot-matmul fallback.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu


def settle(o):
    first = o
    while isinstance(first, (tuple, list)):
        first = first[0]
    jax.block_until_ready(o)
    np.asarray(first).ravel()[:1]


def timeit(f, *args, reps=50):
    out = f(*args); settle(out)
    for _ in range(5):
        out = f(*args)
    settle(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        settle(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


W, T, w, r = 3072, 1024, 25, 128
rng = np.random.default_rng(0)
win_np = rng.standard_normal((W, r)).astype(np.float32)
cols_np = rng.integers(0, W, (w, T)).astype(np.int32)
vals_np = rng.standard_normal((w, T)).astype(np.float32)
win = jnp.asarray(win_np)
cols = jnp.asarray(cols_np)
vals = jnp.asarray(vals_np)
ref = np.zeros((T, r), np.float32)
for k in range(w):
    ref += vals_np[k][:, None] * win_np[cols_np[k]]


def run(kern, name, extra_inputs=(), reps=100):
    try:
        f = jax.jit(lambda W_, C_, V_, *e: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(extra_inputs)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(W_, C_, V_, *e))
        out = f(win, cols, vals, *extra_inputs)
        err = np.abs(np.asarray(out) - ref).max()
        dt = timeit(f, win, cols, vals, *extra_inputs, reps=reps)
        print(f"{name}: OK err={err:.2e}  {dt*1e6:.1f} us/tile  "
              f"-> full-op est {dt*56*1e3:.2f} ms")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# V1: take_along_axis, indices broadcast to [T, r] (same rank, same lanes)
def k_tala(win_ref, cols_ref, vals_ref, out_ref):
    def body(k, acc):
        ck = cols_ref[k]                                # [T]
        idx = jnp.broadcast_to(ck[:, None], (T, r))     # [T, r]
        xg = jnp.take_along_axis(win_ref[:], idx, axis=0)
        return acc + vals_ref[k][:, None] * xg
    out_ref[:] = jax.lax.fori_loop(
        0, w, body, jnp.zeros((T, r), jnp.float32))


# V2: same but indices padded to full window shape [W, r], slice after
def k_tala_full(win_ref, cols_ref, vals_ref, out_ref):
    def body(k, acc):
        ck = cols_ref[k]
        idx = jnp.broadcast_to(
            jnp.pad(ck, (0, W - T))[:, None], (W, r))
        xg = jnp.take_along_axis(win_ref[:], idx, axis=0)[:T]
        return acc + vals_ref[k][:, None] * xg
    out_ref[:] = jax.lax.fori_loop(
        0, w, body, jnp.zeros((T, r), jnp.float32))


# V3: dynamic-slice row loop, 8 rows (one sublane granule) at a time
def k_dynslice(win_ref, cols_ref, vals_ref, out_ref):
    def body(i, _):
        # gather 8 rows one by one — worst case baseline
        def inner(j, acc):
            c = cols_ref[j % w, i * 8 + j // w]
            return acc
        return _
    out_ref[:] = jnp.zeros((T, r), jnp.float32)  # skipped; placeholder


# V4: one-hot matmul gather via MXU over the whole slot: xg = onehot @ win
def k_onehot(win_ref, cols_ref, vals_ref, out_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    def body(k, acc):
        ck = cols_ref[k]
        oh = (iota == ck[:, None]).astype(jnp.float32)   # [T, W]
        xg = jnp.dot(oh, win_ref[:], preferred_element_type=jnp.float32)
        return acc + vals_ref[k][:, None] * xg
    out_ref[:] = jax.lax.fori_loop(
        0, w, body, jnp.zeros((T, r), jnp.float32))


run(k_tala, "take_along_axis [T,r] idx")
run(k_tala_full, "take_along_axis [W,r] idx")
run(k_onehot, "one-hot MXU gather", reps=20)

# V5: XLA (non-pallas) gather of the same shape for comparison
@jax.jit
def xla_gather(win, cols, vals):
    xg = win[cols.reshape(-1)]            # [w*T, r]
    return jnp.sum(vals.reshape(w, T, 1) * xg.reshape(w, T, r), axis=0)

try:
    out = xla_gather(win, cols, vals)
    err = np.abs(np.asarray(out) - ref).max()
    dt = timeit(xla_gather, win, cols, vals, reps=100)
    print(f"xla-fused-gather: OK err={err:.2e}  {dt*1e6:.1f} us/tile  "
          f"-> full-op est {dt*56*1e3:.2f} ms")
except Exception as e:
    print(f"xla-fused-gather: FAIL {type(e).__name__}: {str(e)[:160]}")
