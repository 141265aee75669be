# coding: utf-8
"""Streaming gather SpMM — the Pallas kernel for the VERY sparse regime.

BSR (pallas_spmm.py) carries graphs whose 128x128 block fill is adequate
(UCI-scale); at Facebook/Enron-scale scatter (N≈60-87k, fill 0.03%) the
block bank is unaffordable and XLA's gather/segment lowering of the
reference hot op (torch.sparse.mm, reference layers.py:43-45) runs the
whole SpMM as three HBM passes (measured 71 GB/s effective, 8.7% of v5e
peak — data/bench_spmm_backends.json).

This kernel fuses the three passes into one streaming pass:

  * edges are host-sorted by (row tile, col strip) and packed into fixed
    [E]-slot blocks (padding only at run boundaries);
  * each program gathers its block's x rows from a VMEM-RESIDENT column
    strip (one dynamic gather along sublanes — no HBM round trip);
  * the segment reduction onto the output tile is an MXU matmul against an
    on-the-fly one-hot selection matrix S[r, e] = val_e·[row_e == r], so
    no scatter primitive is needed at all;
  * the output tile lives in VMEM across all blocks of its row tile
    (Pallas revisiting semantics — same flush discipline as the BSR v2
    kernel).

Traffic: x once per (row-tile sweep of its strips), edges once, out once —
vs 3·nnz·d·4 bytes for the XLA lowering.

Differentiable via a transpose plan (dx = A^T @ g), like block_spmm.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_TILE = 512        # output rows per tile (out tile: R_TILE x d in VMEM)
C_STRIP = 16384     # x rows per resident strip (f32: 8 MB at d=128)
E_BLOCK = 1024      # edge slots per program


@struct.dataclass
class StreamPlan:
    """Host-built edge-stream plan (one direction).

    rows:  int32[NB, E] tile-local destination rows (0 on padding).
    cols:  int32[NB, E] strip-local source columns (0 on padding).
    vals:  f32[NB, E]   edge values (0 on padding — padded slots add 0).
    block_rt: int32[NB] row-tile index per block (non-decreasing).
    block_cs: int32[NB] col-strip index per block.
    n_rows/n_cols: padded output/input sizes (static).
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    block_rt: jnp.ndarray
    block_cs: jnp.ndarray
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)


def build_stream_plan(mat, r_tile=R_TILE, c_strip=C_STRIP,
                      e_block=E_BLOCK) -> StreamPlan:
    """scipy sparse [N, M] → StreamPlan (host side)."""
    coo = mat.tocoo()
    keep = coo.data != 0
    r = coo.row[keep].astype(np.int64)
    c = coo.col[keep].astype(np.int64)
    v = coo.data[keep].astype(np.float32)
    n_rows = -(-mat.shape[0] // r_tile) * r_tile
    n_cols = -(-mat.shape[1] // c_strip) * c_strip

    rt = r // r_tile
    cs = c // c_strip
    order = np.lexsort((r, cs, rt))
    r, c, v, rt, cs = r[order], c[order], v[order], rt[order], cs[order]

    # chunk each (rt, cs) run into e_block-slot blocks
    run_key = rt * (n_cols // c_strip) + cs
    run_starts = np.flatnonzero(np.diff(run_key, prepend=run_key[0] - 1)
                                if len(run_key) else np.zeros(0))
    blocks = []
    for i, s in enumerate(run_starts):
        e = run_starts[i + 1] if i + 1 < len(run_starts) else len(r)
        for b0 in range(s, e, e_block):
            b1 = min(b0 + e_block, e)
            blocks.append((rt[b0], cs[b0], b0, b1))
    nb = max(len(blocks), 1)
    rows_a = np.zeros((nb, e_block), np.int32)
    cols_a = np.zeros((nb, e_block), np.int32)
    vals_a = np.zeros((nb, e_block), np.float32)
    block_rt = np.zeros((nb,), np.int32)
    block_cs = np.zeros((nb,), np.int32)
    for i, (brt, bcs, b0, b1) in enumerate(blocks):
        m = b1 - b0
        rows_a[i, :m] = r[b0:b1] - brt * r_tile
        cols_a[i, :m] = c[b0:b1] - bcs * c_strip
        vals_a[i, :m] = v[b0:b1]
        block_rt[i] = brt
        block_cs[i] = bcs
    return StreamPlan(rows=jnp.asarray(rows_a), cols=jnp.asarray(cols_a),
                      vals=jnp.asarray(vals_a),
                      block_rt=jnp.asarray(block_rt),
                      block_cs=jnp.asarray(block_cs),
                      n_rows=int(n_rows), n_cols=int(n_cols))


def build_stream_plans(mat):
    """(fwd, transpose) plans — the pair block_spmm-style custom VJP needs."""
    return build_stream_plan(mat), build_stream_plan(mat.T.tocsr())


def _stream_kernel(block_rt_ref, block_cs_ref, rows_ref, cols_ref, vals_ref,
                   x_ref, out_ref, *, r_tile):
    b = pl.program_id(0)
    row = block_rt_ref[b]
    prev_row = block_rt_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, row != prev_row)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cols = cols_ref[0]                       # [E] strip-local
    gathered = jnp.take(x_ref[:], cols, axis=0, fill_value=0.0)  # [E, d]
    # segment reduction as MXU matmul: S[r, e] = val_e when row_e == r
    local_rows = rows_ref[0]                 # [E]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r_tile, cols.shape[0]), 0)
    sel = jnp.where(iota_r == local_rows[None, :], vals_ref[0][None, :], 0.0)
    out_ref[:] += jnp.dot(sel, gathered,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _stream_spmm_raw(plan: StreamPlan, x: jnp.ndarray,
                     interpret=False) -> jnp.ndarray:
    """x: [n_cols, d] → [n_rows, d]."""
    d = x.shape[1]
    nb = plan.rows.shape[0]
    e = plan.rows.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, e), lambda b, brt, bcs: (b, 0),
                         memory_space=pltpu.VMEM),   # rows stream
            pl.BlockSpec((1, e), lambda b, brt, bcs: (b, 0),
                         memory_space=pltpu.VMEM),   # cols stream
            pl.BlockSpec((1, e), lambda b, brt, bcs: (b, 0),
                         memory_space=pltpu.VMEM),   # vals stream
            pl.BlockSpec((C_STRIP, d), lambda b, brt, bcs: (bcs[b], 0),
                         memory_space=pltpu.VMEM),   # x strip
        ],
        out_specs=pl.BlockSpec((R_TILE, d), lambda b, brt, bcs: (brt[b], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_stream_kernel, r_tile=R_TILE),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_rows, d), jnp.float32),
        interpret=interpret,
    )(plan.block_rt, plan.block_cs, plan.rows, plan.cols, plan.vals, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def stream_spmm(fwd_plan: StreamPlan, t_plan: StreamPlan, x,
                interpret=False):
    """A @ x (A via fwd_plan); differentiable in x (dx = A^T @ g)."""
    xp = _pad_rows(x, fwd_plan.n_cols)
    return _stream_spmm_raw(fwd_plan, xp, interpret=interpret)


def _pad_rows(x, n):
    if x.shape[0] == n:
        return x
    return jnp.zeros((n, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)


def _fwd(fwd_plan, t_plan, x, interpret):
    return stream_spmm(fwd_plan, t_plan, x, interpret), (t_plan, x.shape[0])


def _bwd(interpret, res, g):
    t_plan, n_in = res
    gp = _pad_rows(g, t_plan.n_cols)
    dx = _stream_spmm_raw(t_plan, gp, interpret=interpret)[:n_in]
    return None, None, dx


stream_spmm.defvjp(_fwd, _bwd)
