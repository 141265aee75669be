# coding: utf-8
"""Pallas TPU block-sparse SpMM.

For graphs whose dense mirror exceeds the memory budget, SpMM runs as
block-row sparse (BSR) matmul on the MXU: the adjacency is tiled into
128x128 blocks, empty blocks dropped, and each row-tile's surviving blocks
are multiplied against DMA'd x tiles with double buffering.  This replaces
XLA's gather/scatter lowering of ``segment_sum`` (measured ~46 GB/s
effective on v5e — far below HBM bandwidth) with MXU work at ~33
flops/byte arithmetic intensity.

Sparsity economics: a power-law graph at 128-block granularity has low
per-block fill, but the MXU's compute headroom over the gather path is
larger still; degree-sorting the graph (optional host-side reordering)
raises fill substantially.

Differentiability: ``block_spmm`` carries a custom VJP whose backward uses a
precomputed transpose plan (d x = A^T @ g); block values are graph data and
get no gradient.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


@struct.dataclass
class BlockPlan:
    """Host-built BSR plan (one direction).

    blocks:    f32[NB, BLOCK, BLOCK] dense nonempty blocks, sorted by row
               tile.
    block_col: int32[NB] column-tile index per block.
    row_ptr:   int32[R+1] block range per row tile.
    n_rows / n_cols: padded (multiple of BLOCK) output/input sizes (static).
    """

    blocks: jnp.ndarray
    block_col: jnp.ndarray
    row_ptr: jnp.ndarray
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)


def build_block_plan(mat, block=BLOCK) -> BlockPlan:
    """scipy sparse matrix → forward BlockPlan (host side)."""
    import scipy.sparse as sp

    coo = mat.tocoo()
    n_rows = -(-mat.shape[0] // block) * block
    n_cols = -(-mat.shape[1] // block) * block
    rt = coo.row // block
    ct = coo.col // block
    key = rt.astype(np.int64) * (n_cols // block) + ct
    uniq, inv = np.unique(key, return_inverse=True)
    nb = len(uniq)
    blocks = np.zeros((max(nb, 1), block, block), np.float32)
    np.add.at(blocks,
              (inv, coo.row % block, coo.col % block),
              coo.data.astype(np.float32))
    u_rt = (uniq // (n_cols // block)).astype(np.int32)
    u_ct = (uniq % (n_cols // block)).astype(np.int32)
    r_tiles = n_rows // block
    row_ptr = np.zeros(r_tiles + 1, np.int32)
    np.add.at(row_ptr[1:], u_rt, 1)
    row_ptr = np.cumsum(row_ptr).astype(np.int32)
    if nb == 0:
        u_ct = np.zeros((1,), np.int32)
    return BlockPlan(blocks=jnp.asarray(blocks),
                     block_col=jnp.asarray(u_ct),
                     row_ptr=jnp.asarray(row_ptr),
                     n_rows=int(n_rows), n_cols=int(n_cols))


def build_block_plans(mat, block=BLOCK):
    """(forward_plan, transpose_plan) for fwd SpMM and its VJP."""
    return build_block_plan(mat, block), build_block_plan(mat.T, block)


def _spmm_kernel(row_ptr_ref, block_col_ref, blocks_hbm, x_hbm, out_ref,
                 acc_ref, blk_buf, x_buf, sems):
    i = pl.program_id(0)
    start = row_ptr_ref[i]
    end = row_ptr_ref[i + 1]
    n_blocks = end - start

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def get_dmas(slot, b_idx):
        blk_dma = pltpu.make_async_copy(
            blocks_hbm.at[start + b_idx], blk_buf.at[slot], sems.at[slot, 0])
        ct = block_col_ref[start + b_idx]
        x_dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(ct * BLOCK, BLOCK), :], x_buf.at[slot],
            sems.at[slot, 1])
        return blk_dma, x_dma

    @pl.when(n_blocks > 0)
    def _():
        d0, x0 = get_dmas(0, 0)
        d0.start()
        x0.start()

        def body(b, _):
            slot = b % 2
            nxt = (b + 1) % 2

            @pl.when(b + 1 < n_blocks)
            def _():
                d, x = get_dmas(nxt, b + 1)
                d.start()
                x.start()

            d, x = get_dmas(slot, b)
            d.wait()
            x.wait()
            # HIGHEST: full-f32 MXU passes — the default (bf16) loses ~0.3%
            # relative on high-degree power-law rows
            acc_ref[:] += jnp.dot(blk_buf[slot], x_buf[slot],
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

    out_ref[:] = acc_ref[:]


def _block_spmm_raw(plan: BlockPlan, x: jnp.ndarray,
                    interpret=False) -> jnp.ndarray:
    """x: [n_cols, d] (d multiple of 128) → [n_rows, d]."""
    d = x.shape[1]
    r_tiles = plan.n_rows // BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # blocks (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # x (HBM)
        ],
        out_specs=pl.BlockSpec((BLOCK, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, d), jnp.float32),        # acc
            pltpu.VMEM((2, BLOCK, BLOCK), jnp.float32),  # block double buf
            pltpu.VMEM((2, BLOCK, d), jnp.float32),      # x double buf
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_rows, d), jnp.float32),
        interpret=interpret,
    )(plan.row_ptr, plan.block_col, plan.blocks, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _block_spmm(fwd_plan, t_plan, x, interpret):
    return _block_spmm_raw(fwd_plan, x, interpret)


def _block_spmm_fwd(fwd_plan, t_plan, x, interpret):
    return _block_spmm_raw(fwd_plan, x, interpret), (fwd_plan, t_plan)


def _block_spmm_bwd(interpret, res, g):
    fwd_plan, t_plan = res
    dx = _block_spmm_raw(t_plan, g, interpret)
    return None, None, dx


_block_spmm.defvjp(_block_spmm_fwd, _block_spmm_bwd)


def block_spmm(fwd_plan: BlockPlan, t_plan: BlockPlan, x, interpret=False):
    """A @ x with block-sparse plans; differentiable w.r.t. x.

    x: [n_cols_unpadded, d]; output [n_rows_unpadded, d].  Pads rows and
    feature dim to tile multiples internally.
    """
    n_in = x.shape[0]
    d = x.shape[1]
    d_pad = -(-d // BLOCK) * BLOCK
    x_p = jnp.zeros((fwd_plan.n_cols, d_pad), x.dtype)
    x_p = x_p.at[:n_in, :d].set(x)
    out = _block_spmm(fwd_plan, t_plan, x_p, interpret)
    return out[:, :d]


def spmm_pallas(g, x):
    """SparseGraph adapter (plans rebuilt per call — prefer caching a
    BlockPlan via build_block_plans for hot paths)."""
    from ctgcn_tpu.ops.sparse import to_scipy

    fwd_plan, t_plan = build_block_plans(to_scipy(g))
    return block_spmm(fwd_plan, t_plan, x)[:g.n_rows]
