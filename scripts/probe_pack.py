"""Probe: device ELL->bitpack formulations at 2M rows (v5e, 1 chip).

Measured (steady-state, 2M x 128 cols, V=29523, 8 GB output):
  - XLA broadcast-compare fori_loop (shipped r1-r3):       3.30 s
  - Pallas, rows-on-sublanes, width-1 lane slices per j:  21.4  s
    (each iteration pays a cross-lane broadcast relayout)
  - Pallas, TRANSPOSED: nonzeros on sublanes, rows on
    lanes, word-ids on sublanes (sublane broadcasts are
    native):                                          see output
Run: python scripts/probe_pack.py
"""
import time
import gc

import jax
import jax.numpy as jnp

from vsearch_tpu.ops.bitpack import _round_up, TILE_BITS, LANES, ROW_BLOCK

N, V, NNZP = 2_000_000, 29523, 128
VP = _round_up(V, TILE_BITS)
NUM_WORDS = VP // 32
N_PAD = _round_up(N, ROW_BLOCK)


def make_packT(row_block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(colsT_ref, out_ref):
        t = pl.program_id(1)
        wid = (jax.lax.broadcasted_iota(jnp.int32, (LANES, row_block), 0)
               + t * LANES)
        acc = jnp.zeros((LANES, row_block), jnp.uint32)
        for j in range(NNZP):
            c = colsT_ref[j:j + 1, :]  # [1, row_block] sublane slice
            word = (c // TILE_BITS) * LANES + (c % LANES)
            bitv = (jnp.uint32(1)
                    << ((c % TILE_BITS) // LANES).astype(jnp.uint32))
            acc = acc | jnp.where(word == wid, bitv, jnp.uint32(0))
        out_ref[:] = acc

    @jax.jit
    def pack(cols, nnz):
        valid = jnp.arange(NNZP)[None, :] < nnz[:, None]
        c = jnp.where(valid & (cols >= 0) & (cols < V), cols, -1)
        c = jnp.pad(c, ((0, N_PAD - N), (0, 0)), constant_values=-1)
        cT = c.T  # [NNZP, N_PAD]
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NUM_WORDS, N_PAD), jnp.uint32),
            grid=(N_PAD // row_block, NUM_WORDS // LANES),
            in_specs=[pl.BlockSpec((NNZP, row_block),
                                   lambda i, t: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((LANES, row_block),
                                   lambda i, t: (t, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return f(cT)  # [NUM_WORDS, N_PAD] — transposed; probe skips .T
        # (a global 8 GB transpose needs 16 GB live — would OOM here;
        # production would need an in-kernel per-tile transpose)

    return pack


def make_packT_fused_transpose(row_block: int):
    """Same as make_packT but each program transposes its own tile so
    the output lands directly in [N_PAD, NUM_WORDS] layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(colsT_ref, out_ref):
        t = pl.program_id(1)
        wid = (jax.lax.broadcasted_iota(jnp.int32, (LANES, row_block), 0)
               + t * LANES)
        acc = jnp.zeros((LANES, row_block), jnp.uint32)
        for j in range(NNZP):
            c = colsT_ref[j:j + 1, :]
            word = (c // TILE_BITS) * LANES + (c % LANES)
            bitv = (jnp.uint32(1)
                    << ((c % TILE_BITS) // LANES).astype(jnp.uint32))
            acc = acc | jnp.where(word == wid, bitv, jnp.uint32(0))
        out_ref[:] = acc.T

    @jax.jit
    def pack(cols, nnz):
        valid = jnp.arange(NNZP)[None, :] < nnz[:, None]
        c = jnp.where(valid & (cols >= 0) & (cols < V), cols, -1)
        c = jnp.pad(c, ((0, N_PAD - N), (0, 0)), constant_values=-1)
        cT = c.T
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_PAD, NUM_WORDS), jnp.uint32),
            grid=(N_PAD // row_block, NUM_WORDS // LANES),
            in_specs=[pl.BlockSpec((NNZP, row_block),
                                   lambda i, t: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((row_block, LANES),
                                   lambda i, t: (i, t),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return f(cT)

    return pack


@jax.jit
def chk(w):
    return jnp.sum(w.astype(jnp.int32))


def main():
    key = jax.random.PRNGKey(0)
    cols = jax.random.randint(key, (N, NNZP), 0, V, dtype=jnp.int32)
    nnz = jnp.full((N,), 64, jnp.int32)

    for rb in (512,):
        pack = make_packT(rb)
        w = pack(cols, nnz)
        s = int(chk(w))
        del w
        gc.collect()
        t0 = time.time()
        w = pack(cols, nnz)
        s = int(chk(w))
        print(f"packT row_block={rb}: {time.time() - t0:.3f}s chk={s}")
        del w
        gc.collect()

    for rb in (256, 512):
        pack = make_packT_fused_transpose(rb)
        w = pack(cols, nnz)
        s = int(chk(w))
        del w
        gc.collect()
        t0 = time.time()
        w = pack(cols, nnz)
        s = int(chk(w))
        print(f"packT+fusedT row_block={rb}: {time.time() - t0:.3f}s "
              f"chk={s}")
        del w
        gc.collect()


if __name__ == "__main__":
    from vsearch_tpu.utils.claim_guard import register_tpu_process
    register_tpu_process('probe_pack')
    from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
    enable_compilation_cache()
    main()
