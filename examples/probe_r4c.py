"""Round-4 probe C: indexed-stream BSR SpMM prototype.

Flat grid over nonzero blocks (row-major): A block streamed compactly by
the pipeline, X block DMA'd via scalar-prefetched block-column index map,
Y accumulated in a revisited output block (same out index across a row's
steps).  No maxb padding anywhere -> streamed bytes ~ nblocks*(A+X).
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


def build_blocks(Ar, bs):
    """CSR (CMK-ordered) -> flat row-major block list."""
    import scipy.sparse as sp
    n = Ar.shape[0]
    npad = ((n + bs - 1) // bs) * bs
    A = sp.csr_matrix((Ar.data, Ar.indices, Ar.indptr), shape=Ar.shape)
    A.resize((npad, npad))
    B = sp.bsr_matrix(A, blocksize=(bs, bs))
    B.sort_indices()
    nbr = npad // bs
    rows = np.repeat(np.arange(nbr), np.diff(B.indptr))
    cols = B.indices.astype(np.int32)
    blocks = np.ascontiguousarray(B.data)          # [nb, bs, bs]
    # mark first block of each row for accumulator init
    first = np.zeros(len(rows), np.int32)
    first[np.searchsorted(rows, np.arange(nbr))] = 1
    return blocks, rows.astype(np.int32), cols, first, nbr, npad


def kernel(pk_ref, a_re, a_im, x_re, x_im, y_re, y_im):
    s = pl.program_id(0)
    init = (pk_ref[s] & 1) == 1

    @pl.when(init)
    def _():
        y_re[0] = jnp.zeros_like(y_re[0])
        y_im[0] = jnp.zeros_like(y_im[0])

    hi = jax.lax.Precision.HIGHEST
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=hi)
    Ar, Ai = a_re[0], a_im[0]
    Xr, Xi = x_re[0], x_im[0]
    y_re[0] += dot(Ar, Xr) - dot(Ai, Xi)
    y_im[0] += dot(Ar, Xi) + dot(Ai, Xr)


@partial(jax.jit, static_argnums=(0,))
def spmm(meta, packed, are, aim, xre, xim):
    nb, bs, nbr, r = meta
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda s, pk: (s, 0, 0)),
            pl.BlockSpec((1, bs, bs), lambda s, pk: (s, 0, 0)),
            pl.BlockSpec((1, bs, r),
                         lambda s, pk: ((pk[s] >> 1) & 0x7FFF, 0, 0)),
            pl.BlockSpec((1, bs, r),
                         lambda s, pk: ((pk[s] >> 1) & 0x7FFF, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bs, r),
                         lambda s, pk: (pk[s] >> 16, 0, 0)),
            pl.BlockSpec((1, bs, r),
                         lambda s, pk: (pk[s] >> 16, 0, 0)),
        ),
    )
    out_shape = (jax.ShapeDtypeStruct((nbr, bs, r), jnp.float32),
                 jax.ShapeDtypeStruct((nbr, bs, r), jnp.float32))
    import os
    interp = bool(os.environ.get("WAE_INTERPRET"))
    try:
        cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:
        cp = None
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shape, interpret=interp,
                          compiler_params=cp)(
        packed, are, aim, xre, xim)


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.mesh.refine import octosplit
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.ops.reorder import cuthill_mckee, permute_csr

    mesh = octosplit(rijke_mesh(n_rings=4, nz_cold=58, nz_hot=58))
    gamma, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
    c = mesh.generate_field(lambda x, y, z: np.where(
        z < 0, np.sqrt(gamma * R * Tu), np.sqrt(gamma * R * Tb)))
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Outlet": ("admittance", ("Y", 1e15))}, c)
    L.params["ω"] = 2 * np.pi * 300.0
    A = L.assemble({})
    n, nnz = A.shape[0], A.nnz
    perm = cuthill_mckee(A)
    Ar = permute_csr(A, perm)
    print("n", n, "nnz", nnz)

    import scipy.sparse as sp
    Ah = sp.csr_matrix((Ar.data, Ar.indices, Ar.indptr), shape=Ar.shape)
    r = 128
    rng = np.random.default_rng(0)
    X = (rng.standard_normal((n, r))
         + 1j * rng.standard_normal((n, r))).astype(np.complex64)
    Yref = Ah @ X

    for bs in (64, 128, 32):
        blocks, rows, cols, first, nbr, npad = build_blocks(Ar, bs)
        nb = blocks.shape[0]
        b64 = blocks.astype(np.complex64)
        are = jnp.asarray(np.ascontiguousarray(b64.real))
        aim = jnp.asarray(np.ascontiguousarray(b64.imag))
        Xp = np.zeros((npad, r), np.complex64)
        Xp[:n] = X
        Xb = Xp.reshape(nbr, bs, r)
        xre = jnp.asarray(np.ascontiguousarray(Xb.real))
        xim = jnp.asarray(np.ascontiguousarray(Xb.imag))
        packed = jnp.asarray((rows.astype(np.int32) << 16)
                             | (cols.astype(np.int32) << 1) | first)
        meta = (nb, bs, nbr, r)
        def call(meta, packed, are, aim, xre, xim):
            with jax.enable_x64(False):
                return spmm(meta, packed, are, aim, xre, xim)
        try:
            t0 = time.perf_counter()
            out = call(meta, packed, are, aim, xre, xim)
            settle(out)
            tc = time.perf_counter() - t0
            yre, yim = out
            Y = (np.asarray(yre) + 1j * np.asarray(yim)).reshape(-1, r)[:n]
            err = np.linalg.norm(Y - Yref) / np.linalg.norm(Yref)
            dt = timeit(call, meta, packed, are, aim, xre, xim)
            bytes_streamed = 8.0 * (nb * bs * bs        # A planes
                                    + nb * bs * r       # X blocks
                                    + nbr * bs * r)     # Y write
            print(f"bs={bs}: nb={nb} compile+first {tc:.1f}s  "
                  f"{dt*1e3:.3f} ms  {nnz*r/dt:.3e} nnz/s  "
                  f"{bytes_streamed/dt/1e9:.0f} GB/s "
                  f"(frac {bytes_streamed/dt/8.19e11:.2f})  err {err:.2e}")
        except Exception as e:
            print(f"bs={bs}: FAIL {type(e).__name__}: "
                  f"{str(e).split(chr(10))[0][:200]}")


if __name__ == "__main__":
    main()
