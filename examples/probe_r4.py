"""Round-4 TPU micro-probes (axon chip): measure what drives the designs.

1. dispatch RTT
2. Pallas in-kernel gather variants (feasibility + throughput)
3. VPU f32 FMA throughput
4. XLA dense LU factor/solve timing at the local-solver dimension

Run ONE at a time on the chip (tunnel serializes).  Fetch-synchronized
timing (block_until_ready unreliable on axon).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


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


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind)

    # --- 1. RTT -----------------------------------------------------------
    probe = jax.jit(lambda x: x + 1.0)
    rtt = timeit(probe, jnp.float32(0.0), reps=20)
    print(f"RTT per dispatch: {rtt*1e3:.2f} ms")

    # --- 3. VPU throughput ------------------------------------------------
    from jax import lax
    N, M, K = 1024, 512, 64

    @jax.jit
    def fma_chain(a, b, c):
        def body(i, acc):
            return acc * b + c
        return lax.fori_loop(0, K, body, a)

    a = jnp.ones((N, M), jnp.float32)
    b = jnp.full((N, M), 1.0000001, jnp.float32)
    c = jnp.full((N, M), 1e-9, jnp.float32)
    dt = timeit(fma_chain, a, b, c, reps=100)
    print(f"VPU FMA: {2*N*M*K/dt/1e12:.2f} Tflop/s  ({dt*1e6:.1f} us)")

    # --- 2. Pallas gather variants ---------------------------------------
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, T, w, r = 3072, 1024, 25, 128
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((W, r)), jnp.float32)
    cols = jnp.asarray(rng.integers(0, W, (w, T)), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((w, T)), jnp.float32)

    def k_fancy(win_ref, cols_ref, vals_ref, out_ref):
        c = cols_ref[:]                      # [w, T]
        xg = win_ref[:][c]                   # gather -> [w, T, r]
        out_ref[:] = jnp.sum(vals_ref[:][:, :, None] * xg, axis=0)

    def k_loop(win_ref, cols_ref, vals_ref, out_ref):
        def body(k, acc):
            ck = cols_ref[k]                 # [T]
            xg = win_ref[:][ck]              # [T, r] vector-index gather
            return acc + vals_ref[k][:, None] * xg
        acc = jax.lax.fori_loop(0, w, body, jnp.zeros((T, r), jnp.float32))
        out_ref[:] = acc

    def k_take(win_ref, cols_ref, vals_ref, out_ref):
        def body(k, acc):
            ck = cols_ref[k]
            xg = jnp.take(win_ref[:], ck, axis=0)
            return acc + vals_ref[k][:, None] * xg
        acc = jax.lax.fori_loop(0, w, body, jnp.zeros((T, r), jnp.float32))
        out_ref[:] = acc

    def run(kern, name):
        try:
            f = jax.jit(lambda W_, C_, V_: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T, r), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(W_, C_, V_))
            out = f(win, cols, vals)
            ref = np.zeros((T, r), np.float32)
            cn, vn, wn = np.asarray(cols), np.asarray(vals), np.asarray(win)
            for k in range(w):
                ref += vn[k][:, None] * wn[cn[k]]
            err = np.abs(np.asarray(out) - ref).max()
            dt = timeit(f, win, cols, vals, reps=100)
            ns_per_gather_row = dt / (w * T) * 1e9
            print(f"{name}: OK err={err:.2e}  {dt*1e6:.1f} us/tile "
                  f"({ns_per_gather_row:.2f} ns/gathered row, "
                  f"{w*T*r*2/dt/1e12:.2f} Tflop/s effective)")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAIL {type(e).__name__}: {msg}")

    run(k_fancy, "gather-fancy-2d")
    run(k_loop, "gather-loop-vector")
    run(k_take, "gather-loop-take")

    # --- 4. dense LU on device -------------------------------------------
    n = 1024
    A = rng.standard_normal((n, n)).astype(np.float32)
    Ai = rng.standard_normal((n, n)).astype(np.float32)
    np.fill_diagonal(A, 100.0)

    @jax.jit
    def lu_fac(ar, ai):
        Ac = jax.lax.complex(ar, ai)
        lu, piv = jax.scipy.linalg.lu_factor(Ac)
        return jnp.real(lu), jnp.imag(lu), piv

    ar, ai = jnp.asarray(A), jnp.asarray(Ai)
    t0 = time.perf_counter()
    out = lu_fac(ar, ai); settle(out)
    print(f"LU compile+first: {time.perf_counter()-t0:.1f} s")
    dt = timeit(lu_fac, ar, ai, reps=5)
    print(f"LU factor n={n} c64: {dt*1e3:.1f} ms")

    lur, lui, piv = lu_fac(ar, ai)

    @jax.jit
    def lu_sol(lur, lui, piv, br, bi):
        lu = jax.lax.complex(lur, lui)
        b = jax.lax.complex(br, bi)
        x = jax.scipy.linalg.lu_solve((lu, piv), b)
        return jnp.real(x), jnp.imag(x)

    br = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    dt = timeit(lu_sol, lur, lui, piv, br, br, reps=20)
    print(f"LU solve 1 rhs: {dt*1e3:.2f} ms")

    # m-step arnoldi-like chain of lu_solves fused in one program
    m = 26

    @jax.jit
    def chain(lur, lui, piv, br, bi):
        lu = jax.lax.complex(lur, lui)

        def body(i, vb):
            v = jax.scipy.linalg.lu_solve((lu, piv), vb)
            return v / jnp.linalg.norm(v)
        v = jax.lax.fori_loop(0, m, body, jax.lax.complex(br, bi))
        return jnp.real(v), jnp.imag(v)

    t0 = time.perf_counter()
    out = chain(lur, lui, piv, br, br); settle(out)
    print(f"fused {m}-solve chain compile+first: {time.perf_counter()-t0:.1f} s")
    dt = timeit(chain, lur, lui, piv, br, br, reps=10)
    print(f"fused {m}-solve chain: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
