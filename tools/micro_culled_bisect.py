"""Bisect which construct of _kernel_culled fails the remote TPU compile."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 128
TB = 128


def run(name, kernel, scratch, n_in=1):
    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
            out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
        )(jnp.arange(4, dtype=jnp.int32),
          *([jnp.arange(NT * 512, dtype=jnp.int32).reshape(-1)]
            if n_in == 1 else
            [jnp.arange(NT * 512, dtype=jnp.int32).reshape(-1),
             jnp.ones((NT * 3 * TB, 4), jnp.float32)]))
        jax.block_until_ready(out)
        print(name, "OK")
    except Exception as e:
        print(name, "FAILED:", type(e).__name__)


# A: 1-D HBM int32 -> SMEM DMA
def k_a(cnt_ref, hbm, out, smem, sem):
    i = pl.program_id(0)
    row = pl.multiple_of(i * NT, 128)
    cp = pltpu.make_async_copy(hbm.at[pl.ds(row, NT)], smem, sem)
    cp.start(); cp.wait()
    out[...] = jnp.full((1, 128), 1.0) * smem[0].astype(jnp.float32)


run("A_hbm_to_smem_1d", k_a,
    [pltpu.SMEM((NT,), jnp.int32), pltpu.SemaphoreType.DMA(())])


# B: dynamic HBM offset from an SMEM value -> VMEM DMA
def k_b(cnt_ref, hbm, vals, out, smem, buf, sem0, sem1):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(hbm.at[pl.ds(pl.multiple_of(i * NT, 128), NT)],
                               smem, sem0)
    cp.start(); cp.wait()
    blk = smem[0]
    s = pl.multiple_of(blk * (3 * TB), 8)
    cp2 = pltpu.make_async_copy(vals.at[pl.ds(s, 3 * TB), :], buf, sem1)
    cp2.start(); cp2.wait()
    out[...] = buf[0:1, 0:1] * jnp.ones((1, 128))


run("B_dyn_offset_from_smem", k_b,
    [pltpu.SMEM((NT,), jnp.int32), pltpu.VMEM((3 * TB, 4), jnp.float32),
     pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())], n_in=2)


# C: DMA inside while_loop with (2,2) semaphore array
def k_c(cnt_ref, hbm, vals, out, smem, buf, sem0, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(hbm.at[pl.ds(pl.multiple_of(i * NT, 128), NT)],
                               smem, sem0)
    cp.start(); cp.wait()
    cnt = cnt_ref[i]

    def start_dma(k_idx, slot):
        blk = smem[k_idx]
        s = pl.multiple_of(blk * (3 * TB), 8)
        pltpu.make_async_copy(vals.at[pl.ds(s, 3 * TB), :],
                              buf.at[slot], sem.at[slot, 0]).start()

    @pl.when(cnt > 0)
    def _():
        start_dma(0, 0)

    def w_cond(st):
        k, acc = st
        return k < cnt

    def w_body(st):
        k, acc = st
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < cnt)
        def _():
            start_dma(k + 1, jax.lax.rem(k + 1, 2))

        blk = smem[k]
        s = pl.multiple_of(blk * (3 * TB), 8)
        pltpu.make_async_copy(vals.at[pl.ds(s, 3 * TB), :],
                              buf.at[slot], sem.at[slot, 0]).wait()
        return k + 1, acc + buf[slot, 0:1, 0:1] * jnp.ones((1, 128))

    _, acc = jax.lax.while_loop(w_cond, w_body,
                                (jnp.int32(0), jnp.zeros((1, 128))))
    out[...] = acc


run("C_dma_in_while", k_c,
    [pltpu.SMEM((NT,), jnp.int32), pltpu.VMEM((2, 3 * TB, 4), jnp.float32),
     pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA((2, 2))], n_in=2)


# A4: 2-D HBM int32 -> SMEM DMA
def k_a4(cnt_ref, hbm2, out, smem, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(hbm2.at[pl.ds(i, 1), :], smem, sem)
    cp.start(); cp.wait()
    out[...] = jnp.full((1, 128), 1.0) * smem[0, 0].astype(jnp.float32)


try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, NT), jnp.int32),
                        pltpu.SemaphoreType.DMA(())])
    out = pl.pallas_call(k_a4, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
                         )(jnp.arange(4, dtype=jnp.int32),
                           jnp.arange(4 * NT, dtype=jnp.int32).reshape(4, NT))
    jax.block_until_ready(out)
    print("A4_hbm_to_smem_2d OK")
except Exception as e:
    print("A4_hbm_to_smem_2d FAILED:", type(e).__name__)


# D: blist row via SMEM BlockSpec (pallas auto-copy per grid step)
def k_d(cnt_ref, bl_ref, out):
    i = pl.program_id(0)
    out[...] = jnp.full((1, 128), 1.0) * bl_ref[0, 0].astype(jnp.float32)


try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec((1, NT), lambda i, *_: (i, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM))
    out = pl.pallas_call(k_d, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
                         )(jnp.arange(4, dtype=jnp.int32),
                           jnp.arange(4 * NT, dtype=jnp.int32).reshape(4, NT))
    jax.block_until_ready(out)
    print("D_smem_blockspec OK")
except Exception as e:
    print("D_smem_blockspec FAILED:", type(e).__name__)


# E: 1-D HBM f32 -> 1-D VMEM DMA
def k_e(cnt_ref, hbm, out, buf, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(hbm.at[pl.ds(pl.multiple_of(i * NT, 128), NT)],
                               buf, sem)
    cp.start(); cp.wait()
    out[...] = buf[0:1].astype(jnp.float32) * jnp.ones((1, 128))


try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NT,), jnp.float32),
                        pltpu.SemaphoreType.DMA(())])
    out = pl.pallas_call(k_e, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
                         )(jnp.arange(4, dtype=jnp.int32),
                           jnp.arange(4.0 * NT, dtype=jnp.float32))
    jax.block_until_ready(out)
    print("E_hbm_to_vmem_1d OK")
except Exception as e:
    print("E_hbm_to_vmem_1d FAILED:", type(e).__name__)
