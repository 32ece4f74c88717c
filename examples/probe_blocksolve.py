"""Feasibility probe: batched dense linalg inside lax.scan on the TPU.

Question for the block-tridiagonal direct solver design: does
``jnp.linalg.solve`` on [B, s, s] batches inside a ``lax.scan`` body
compile in seconds (traced once) and run at MXU speed — or does it hit
the minutes-long loop-program compiles measured for device linalg under
wide vmaps in round 2?  Prints compile and steady-state wall times.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import numpy as np
import jax
import jax.numpy as jnp
import wavesandeigenvalues_jl_tpu  # noqa: F401  (sets matmul precision)

B, s, m, l = 16, 192, 64, 8   # shifts per chunk, slab size, slabs, rhs cols


def planes(x):
    return (np.ascontiguousarray(x.real).astype(np.float32),
            np.ascontiguousarray(x.imag).astype(np.float32))


rng = np.random.default_rng(0)
# block tridiagonal: D_i dominant, U/L couplings
D = (rng.standard_normal((m, B, s, s)) + 1j * rng.standard_normal((m, B, s, s))).astype(np.complex64)
for i in range(m):
    D[i] += 8 * np.eye(s)
U = 0.5 * (rng.standard_normal((m, B, s, s)) + 1j * rng.standard_normal((m, B, s, s))).astype(np.complex64)
Lo = 0.5 * (rng.standard_normal((m, B, s, s)) + 1j * rng.standard_normal((m, B, s, s))).astype(np.complex64)
b = (rng.standard_normal((m, B, s, l)) + 1j * rng.standard_normal((m, B, s, l))).astype(np.complex64)


@jax.jit
def thomas(Dr, Di, Ur, Ui, Lr, Li, br, bi):
    Dc = jax.lax.complex(Dr, Di)
    Uc = jax.lax.complex(Ur, Ui)
    Lc = jax.lax.complex(Lr, Li)
    bc = jax.lax.complex(br, bi)

    def fwd(carry, inp):
        Cprev, yprev = carry            # [B,s,s], [B,s,l]
        Dk, Uk, Lk, bk = inp
        Dt = Dk - Lk @ Cprev
        rhs = jnp.concatenate([Uk, bk - Lk @ yprev], axis=-1)
        sol = jnp.linalg.solve(Dt, rhs)
        C = sol[..., :s]
        y = sol[..., s:]
        return (C, y), (C, y)

    C0 = jnp.zeros((B, s, s), Dc.dtype)
    y0 = jnp.zeros((B, s, l), Dc.dtype)
    _, (Cs, ys) = jax.lax.scan(fwd, (C0, y0), (Dc, Uc, Lc, bc))

    def bwd(xnext, inp):
        Ck, yk = inp
        x = yk - Ck @ xnext
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros((B, s, l), Dc.dtype),
                         (Cs, ys), reverse=True)
    return jnp.real(xs), jnp.imag(xs)


args = (*planes(D), *planes(U), *planes(Lo), *planes(b))
t0 = time.perf_counter()
xr, xi = thomas(*args)
jax.block_until_ready((xr, xi))
t_compile = time.perf_counter() - t0
print(f"first call (compile+run): {t_compile:.2f}s")
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    xr, xi = thomas(*args)
jax.block_until_ready((xr, xi))
dt = (time.perf_counter() - t0) / reps
flops = m * B * (2 * s**3 / 3 + 2 * s * s * (s + l) + 2 * s * s * (s + l)) * 8
print(f"steady: {dt*1e3:.1f} ms  (~{flops/dt/1e12:.2f} eff TFLOP/s, "
      f"B={B} s={s} m={m})")

# accuracy: check block-tridiag residual on host for shift 0
x = (np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64))  # [m,B,s,l]
r = 0.0
for i in range(m):
    lhs = D[i, 0].astype(np.complex128) @ x[i, 0]
    if i > 0:
        lhs += Lo[i, 0].astype(np.complex128) @ x[i - 1, 0]
    if i < m - 1:
        lhs += U[i, 0].astype(np.complex128) @ x[i + 1, 0]
    r = max(r, np.linalg.norm(lhs - b[i, 0]) / np.linalg.norm(b[i, 0]))
print(f"max block-row relres (shift 0): {r:.2e}")
