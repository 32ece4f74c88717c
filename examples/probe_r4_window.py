"""A/B the round-4 WindowSpmm against the round-3 BSR kernel on the real
57k-DOF operator, chained in-program, interleaved trials."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def sync(o):
    first = o
    while isinstance(first, (tuple, list)):
        first = first[0]
    jax.block_until_ready(o)
    np.asarray(first).ravel()[:1]


def main():
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.mesh.refine import octosplit
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.ops.reorder import cuthill_mckee, permute_csr
    from wavesandeigenvalues_jl_tpu.ops.window_spmm import WindowBsr, WindowSpmm
    from wavesandeigenvalues_jl_tpu.ops.device import BsrOperator
    from wavesandeigenvalues_jl_tpu.ops.pallas_spmv import PallasBsrSpmm
    import scipy.sparse as sp

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
    Ah = sp.csr_matrix((Ar.data, Ar.indices, Ar.indptr), shape=Ar.shape)

    r = 128
    rng = np.random.default_rng(0)
    X = (rng.standard_normal((n, r))
         + 1j * rng.standard_normal((n, r))).astype(np.complex64)
    Yref = Ah @ X

    # ---- new kernel ----
    wb = WindowBsr.from_csr(Ar)
    print(f"window: ntiles={wb.ntiles} mslot={wb.mslot} "
          f"slot_fill={wb.slot_fill:.2f} "
          f"A_MB={wb.padded_block_bytes/1e6:.0f} "
          f"stream_MB={WindowSpmm(wb, nrhs=r).stream_bytes/1e6:.0f}")
    op = WindowSpmm(wb, nrhs=r)
    Y = op(X)
    err = np.linalg.norm(Y - Yref) / np.linalg.norm(Yref)
    print("window rel err:", err)
    M = 20
    chain = op.chain_fn(M)
    panels = op.split_panels(X)
    sync(chain(*panels))

    # ---- old kernel ----
    try:
        bsr = BsrOperator.from_csr(Ar, bs=64)
        old = PallasBsrSpmm(bsr, nrhs=r)
        panels_o = old.split_panels(X)
        Yo = old(X)
        err_o = np.linalg.norm(np.asarray(Yo)[:n] - Yref) / np.linalg.norm(Yref)
        print("old rel err:", err_o)

        from wavesandeigenvalues_jl_tpu.ops.pallas_spmv import _bsr_spmm_jit
        meta_o = old.meta

        @jax.jit
        def chain_old_impl(cols, bre, bim, xr, xi):
            def body(carry, _):
                xr, xi = carry
                with jax.enable_x64(False):
                    yr, yi = _bsr_spmm_jit(meta_o, cols, bre, bim, xr, xi,
                                           False, None)
                s = 1.0 / jnp.maximum(
                    jnp.sqrt(jnp.sum(yr * yr) + jnp.sum(yi * yi)), 1e-30)
                return (yr * s, yi * s), 0
            (yr, yi), _ = jax.lax.scan(body, (xr, xi), None, length=M)
            return yr, yi

        def chain_old(xr, xi):
            return chain_old_impl(old.cols, old.blocks_re, old.blocks_im,
                                  xr, xi)
        sync(chain_old(*panels_o))
        have_old = True
    except Exception as e:
        print("old kernel failed:", str(e)[:120])
        have_old = False

    for trial in range(4):
        t0 = time.perf_counter(); sync(chain(*panels))
        d_new = (time.perf_counter() - t0) / M
        d_old = float("nan")
        if have_old:
            t0 = time.perf_counter(); sync(chain_old(*panels_o))
            d_old = (time.perf_counter() - t0) / M
        print(f"trial{trial}: new {d_new*1e3:.2f} ms "
              f"({nnz*r/d_new:.2e} nnz/s, "
              f"{op.stream_bytes/d_new/1e9:.0f} GB/s, "
              f"frac {op.stream_bytes/d_new/8.19e11:.2f}) | "
              f"old {d_old*1e3:.2f} ms ({nnz*r/d_old:.2e} nnz/s)")


if __name__ == "__main__":
    main()
