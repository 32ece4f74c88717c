import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu


def win_kernel_fn(meta):
    ntiles, T, g, maxb, r = meta
    nbr = T // g

    def kernel(cols_ref, a_ref, xm, x0, xp, o_ref, win):
        win[pl.ds(0, T), :] = xm[0]
        win[pl.ds(T, T), :] = x0[0]
        win[pl.ds(2 * T, T), :] = xp[0]

        def row_body(i, _):
            def blk(k, acc):
                c = cols_ref[0, i, k]
                xg = win[pl.ds(c * g, g), :]
                return acc + jnp.dot(a_ref[0, i, k], xg,
                                     preferred_element_type=jnp.float32)
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

    def call(cols, A, Xr):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, T, r), jnp.float32),
        )(cols, A, Xr, Xr, Xr)
    return call
