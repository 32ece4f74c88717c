"""Round-4 probe D: in-kernel dynamic-slice gather loop rate.

Kernel: VMEM-resident window [W, r]; loop over nb supernode blocks, each
does acc += A_blk[g,g] @ win[pl.ds(c*g, g), :] (complex via planes).
Measures the achievable block-processing rate — the primitive for the
sliding-window SpMM.
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


def make(T, W, g, maxb, r):
    """One tile: T rows (T/g block-rows), window W rows, maxb blocks/row."""
    nbr = T // g
    rng = np.random.default_rng(0)
    cols = rng.integers(0, W // g, (nbr, maxb)).astype(np.int32)
    Ab = rng.standard_normal((nbr, maxb, g, g)).astype(np.float32)
    win = rng.standard_normal((W, r)).astype(np.float32)

    def kernel(cols_ref, a_ref, w_ref, o_ref):
        def row_body(i, _):
            def blk(k, acc):
                c = cols_ref[i, k]
                xb = w_ref[pl.ds(c * g, g), :]
                return acc + jnp.dot(a_ref[i, k], xb,
                                     preferred_element_type=jnp.float32)
            acc = jax.lax.fori_loop(0, maxb, blk,
                                    jnp.zeros((g, r), jnp.float32))
            o_ref[pl.ds(i * g, g), :] = acc
            return 0
        jax.lax.fori_loop(0, nbr, row_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(cols, Ab, win):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, r), jnp.float32),
        )(cols, Ab, win)

    def ref():
        out = np.zeros((T, r), np.float32)
        for i in range(nbr):
            for k in range(maxb):
                c = cols[i, k]
                out[i*g:(i+1)*g] += Ab[i, k] @ win[c*g:(c+1)*g]
        return out

    return f, (jnp.asarray(cols), jnp.asarray(Ab), jnp.asarray(win)), ref


def run(T, W, g, maxb, r=128):
    try:
        with jax.enable_x64(False):
            f, args, ref = make(T, W, g, maxb, r)
            out = f(*args)
            err = np.abs(np.asarray(out) - ref()).max()
            dt = timeit(f, *args)
        nb = (T // g) * maxb
        print(f"g={g} maxb={maxb} T={T}: err={err:.1e} {dt*1e6:.1f} us "
              f"({dt/nb*1e9:.0f} ns/block, {dt/nb*940:.0f} cyc/blk) "
              f"-> {nb*g*g*2*r/dt/1e12:.2f} Tflop/s")
    except Exception as e:
        print(f"g={g} maxb={maxb}: FAIL {type(e).__name__}: "
              f"{str(e).split(chr(10))[0][:140]}")


if __name__ == "__main__":
    run(1024, 3072, 16, 6)
    run(1024, 3072, 32, 4)
    run(1024, 3072, 8, 10)
    run(2048, 4096, 16, 6)
    run(1024, 3072, 64, 3)
    run(1024, 3072, 128, 3)
