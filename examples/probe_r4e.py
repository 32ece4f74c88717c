"""Round-4 probe E: full-scale sliding-window supernode SpMM prototype.

Grid over row-tiles; per tile a 3-block window of X is staged into VMEM
scratch (static index maps -> pipelined DMA); in-kernel fori_loop over
supernode blocks does pl.ds gather + MXU matmul.  Real f32 single-plane
first (complex = 4x the same work).
"""
import time
from functools import partial
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


def timeit(f, *args, reps=30):
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


def build(ntiles, T, g, maxb, r, seed=0):
    """Synthetic banded supernode structure, columns within [-1,+1] tile."""
    nbr = T // g           # block-rows per tile
    Wb = 3 * T // g        # window blocks
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, Wb, (ntiles, nbr, maxb)).astype(np.int32)
    A = rng.standard_normal((ntiles, nbr, maxb, g, g)).astype(np.float32)
    X = rng.standard_normal((ntiles * T, r)).astype(np.float32)
    return cols, A, X


@partial(jax.jit, static_argnums=(0,))
def spmm(meta, cols, A, Xb):
    ntiles, T, g, maxb, r = meta
    nbr = T // g

    def kernel(cols_ref, a_ref, xm, x0, xp, o_ref, win):
        # stage the 3-block window into scratch
        win[pl.ds(0, T), :] = xm[0]
        win[pl.ds(T, T), :] = x0[0]
        win[pl.ds(2 * T, T), :] = xp[0]

        def row_body(i, _):
            def blk(k, acc):
                c = cols_ref[0, i, k]
                xg = win[pl.ds(c * g, g), :]
                return acc + jnp.dot(a_ref[0, i, k], xg,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
            acc = jax.lax.fori_loop(0, maxb, blk,
                                    jnp.zeros((g, r), jnp.float32))
            o_ref[0, pl.ds(i * g, g), :] = acc
            return 0
        jax.lax.fori_loop(0, nbr, row_body, 0)

    nt = ntiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nbr, maxb), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nbr, maxb, g, g), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, T, r), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((1, T, r), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, T, r),
                         lambda i: (jnp.minimum(i + 1, nt - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, r), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3 * T, r), jnp.float32)],
    )
    Xr = Xb.reshape(nt, T, r)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, T, r), jnp.float32),
    )(cols, A, Xr, Xr, Xr)


def run(ntiles=56, T=1024, g=16, maxb=24, r=128):
    meta = (ntiles, T, g, maxb, r)
    cols, A, X = build(ntiles, T, g, maxb, r)
    try:
        with jax.enable_x64(False):
            f = lambda c, a, x: spmm(meta, c, a, x)
            t0 = time.perf_counter()
            out = f(jnp.asarray(cols), jnp.asarray(A), jnp.asarray(X))
            settle(out)
            tc = time.perf_counter() - t0
            # correctness spot check on tile 1
            o1 = np.asarray(out[1])
            ref = np.zeros((T, r), np.float32)
            win = X[0 * T:3 * T]
            for i in range(T // g):
                for k in range(maxb):
                    c = cols[1, i, k]
                    ref[i*g:(i+1)*g] += A[1, i, k] @ win[c*g:(c+1)*g]
            err = np.abs(o1 - ref).max() / max(np.abs(ref).max(), 1)
            dt = timeit(f, jnp.asarray(cols), jnp.asarray(A),
                        jnp.asarray(X))
        nb = ntiles * (T // g) * maxb
        bytes_s = 4.0 * (A.size + 3 * X.size + X.size)   # A + 3x X + Y
        print(f"g={g} maxb={maxb}: err={err:.1e} compile {tc:.0f}s "
              f"{dt*1e3:.3f} ms  {dt/nb*1e9:.0f} ns/blk  "
              f"{bytes_s/dt/1e9:.0f} GB/s-streamed  "
              f"{nb*g*g*2*r/dt/1e12:.2f} Tflop/s")
    except Exception as e:
        print(f"g={g} maxb={maxb}: FAIL {type(e).__name__}: "
              f"{str(e).split(chr(10))[0][:140]}")


if __name__ == "__main__":
    run(g=16, maxb=24)    # ~ real supernode count at fill .25: nnz pads
    run(g=8, maxb=40)
    run(g=32, maxb=12)
