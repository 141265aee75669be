# coding: utf-8
"""CorePyramid: the k-core adjacency hierarchy as a static-shape container.

The reference loads, per snapshot, a variable-length list of k-core adjacency
matrices ordered max-core-first, adds I to the first (max-core) matrix only,
and *drops* any core whose delta vs the previous core is empty (reference
helper.py:51-82).  Variable-length lists don't jit, so here the pyramid is a
fixed bank of K core slots:

  rows/cols/vals: [K, P] padded COO per core slot (slot 0 = max core, +I)
  valid:          bool[K] — False for dropped (delta-empty) and absent cores

Masked scan over the slots reproduces the reference numerics exactly: an
invalid slot neither extends the diffusion prefix sum nor advances the
core-axis RNN (see ctgcn_tpu.nn.core_models.CoreDiffusion).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.utils import pad_bucket


@struct.dataclass
class CorePyramid:
    rows: jnp.ndarray   # int32[K, P]
    cols: jnp.ndarray   # int32[K, P]
    vals: jnp.ndarray   # float32[K, P]
    valid: jnp.ndarray  # bool[K]
    n_nodes: int = struct.field(pytree_node=False)
    # Optional dense [K, N, N] mirror of the slots.  TPU gathers run far
    # below HBM bandwidth while the MXU is idle, so for small graphs the
    # k-core SpMMs are fastest as one batched dense matmul; the loader
    # materializes this when the memory budget allows.
    dense: jnp.ndarray | None = None
    # Optional Pallas BSR plans (ops/pallas_spmm.BlockPlan): the whole
    # pyramid's K slot products as ONE block-diagonal [K*Np, Np] kernel call
    # plus its transpose for the VJP.  Built by the loader when the dense
    # mirror would blow the memory budget (Facebook/Enron scale); plan leaves
    # are ordinary pytree arrays so they stack over T and live inside jit.
    plan_fwd: object | None = None
    plan_t: object | None = None
    # Optional degree-bucketed ELL plans (ops/ell.EllPlan): the scatter-free
    # dense-reduction SpMM for the very sparse regime where BSR block fill
    # degenerates (measured 1.7x f32 / 2.2x bf16 over gather+segment_sum on
    # v5e at Facebook scale — see ops/ell.py).  Built per WINDOW over the
    # stacked pyramid (leaves carry a leading [T] axis; vmap slices them).
    ell_fwd: object | None = None
    ell_t: object | None = None
    # bf16 ELL gathers (matmul_precision config); static so it can steer
    # tracing.
    ell_bf16: bool = struct.field(pytree_node=False, default=False)
    # Delta-encoded ELL plans: slots hold Δ_k = A_k − A_{k-1} (k-core
    # nesting makes this exact — ops/ell.build_pyramid_ell_plans), the
    # model reconstructs prefixes with a K×K matmul and "+ x" for the +I.
    ell_delta: bool = struct.field(pytree_node=False, default=False)
    # Dense-bank MXU precision for an f32 bank: "highest" (bf16_6x — bit-
    # level f32 parity, the default) or "high" (bf16_3x — ~1.75x faster
    # with ~3.5e-6 mean rel err on the UCI bank; measured on v5e, see
    # data/bench_precision.json).  Ignored for a bf16 bank (single pass).
    dense_prec: str = struct.field(pytree_node=False, default="highest")
    # Core-sorted leading-principal-block mirror (the small-graph fast
    # path).  K-core supports are NESTED (the k-core is exactly the nodes
    # with coreness >= k), so under one per-snapshot permutation — nodes
    # sorted by coreness descending — EVERY slot's adjacency lives in a
    # leading n_k x n_k principal block.  ``blocks`` holds those cropped
    # dense blocks (slot 0 WITHOUT the +I, which the model re-adds as
    # "+ x"), bucket-padded to multiples of 256; ``perm``/``inv_perm`` map
    # node order.  Sum(n_k^2) MACs instead of K*N^2 — 48x less on UCI
    # (mean over snapshots).  Single pyramid: tuple over core slots of
    # [nb_k, nb_k] arrays; stacked: tuple over slots of [T, nb_k, nb_k]
    # (stack_pyramids pads each slot to the window-max block size — zero
    # padding is exact — so the leaves vmap over t and shard over the
    # mesh's time axis like every other [T]-leading leaf).
    blocks: object | None = None
    perm: jnp.ndarray | None = None       # int32[N] (stacked: [T, N])
    inv_perm: jnp.ndarray | None = None   # int32[N] (stacked: [T, N])

    @property
    def num_slots(self) -> int:
        return int(self.rows.shape[0])

    @property
    def capacity(self) -> int:
        return int(self.rows.shape[1])


def build_core_pyramid(core_mats, n_nodes, num_slots=None, pad_to=None,
                       add_eye_first=True, drop_empty_delta=True,
                       densify=False, dense_dtype=None, build_plans=False,
                       dense_prec="highest", build_blocks=False,
                       as_numpy=False):
    """Build a CorePyramid from scipy matrices ordered max-core-first.

    Args:
      core_mats: list of scipy sparse [N, N], max core first (the caller is
        responsible for the reference's truncate-to-max_core + reverse step).
      num_slots: fixed K (≥ number of kept cores); defaults to len(core_mats).
      pad_to: per-slot COO capacity; defaults to a power-of-two bucket over
        the max kept nnz (max-core slot includes +I).
      add_eye_first: add I to slot 0 (reference helper.py:71-73).
      drop_empty_delta: mark a core invalid when it equals the previous kept
        core (reference helper.py:74-76's delta-skip, as a mask).
      as_numpy: keep the padded COO leaves as host numpy arrays.  The
        loader uses this to avoid round-tripping the [T, K, P] bank
        through the (slow) host↔device link when a derived backend (ELL
        plans) is about to supersede it — plans then build from host
        memory and the loader ships only what the model will read.
    """
    import scipy.sparse as sp

    kept = []
    kept_raw = []  # kept slots WITHOUT the slot-0 +I (block backend input)
    prev = None
    for j, mat in enumerate(core_mats):
        mat = mat.tocsr()
        if j == 0:
            out = mat + sp.eye(n_nodes, format="csr") if add_eye_first else mat
            kept.append(out)
            kept_raw.append(mat)
        else:
            if drop_empty_delta and prev is not None:
                delta = (mat - prev)
                if abs(delta).sum() == 0:
                    prev = mat
                    continue
            kept.append(mat)
            kept_raw.append(mat)
        prev = mat

    K = int(num_slots) if num_slots is not None else max(len(kept), 1)
    assert len(kept) <= K, f"{len(kept)} kept cores > {K} slots"
    max_nnz = max((m.nnz for m in kept), default=1)
    P = int(pad_to) if pad_to is not None else pad_bucket(max_nnz, 256)

    rows = np.zeros((K, P), np.int32)
    cols = np.zeros((K, P), np.int32)
    vals = np.zeros((K, P), np.float32)
    valid = np.zeros((K,), bool)
    for k, m in enumerate(kept):
        coo = m.tocoo()
        keep = coo.data != 0
        r, c, v = coo.row[keep], coo.col[keep], coo.data[keep]
        order = np.lexsort((c, r))
        r, c, v = r[order], c[order], v[order]
        nnz = r.shape[0]
        assert nnz <= P, f"core nnz {nnz} > capacity {P}"
        rows[k, :nnz] = r
        cols[k, :nnz] = c
        vals[k, :nnz] = v
        valid[k] = True

    conv = (lambda a: a) if as_numpy else jnp.asarray
    rows_j = conv(rows)
    cols_j = conv(cols)
    vals_j = conv(vals)
    dense = None
    if densify:
        # Densify ON DEVICE from the (already-shipped) COO: a host-built
        # [K, N, N] tensor would cross the host↔device link at far below
        # HBM bandwidth, while a one-time device scatter is nearly free.
        dense = _densify_on_device(rows_j, cols_j, vals_j, n_nodes,
                                   dtype=dense_dtype or jnp.float32)

    plan_fwd = plan_t = None
    if build_plans:
        from ctgcn_tpu.ops.pallas_spmm import build_pyramid_plans

        plan_fwd, plan_t = build_pyramid_plans(
            list(enumerate(kept)), n_nodes, K)

    blocks = perm = inv_perm = None
    if build_blocks:
        built = _build_core_blocks(kept_raw, n_nodes,
                                   dtype=dense_dtype or jnp.float32)
        if built is not None:
            blocks, perm, inv_perm = built

    return CorePyramid(rows=rows_j, cols=cols_j, vals=vals_j,
                       valid=conv(valid), n_nodes=int(n_nodes),
                       dense=dense, plan_fwd=plan_fwd, plan_t=plan_t,
                       dense_prec=dense_prec, blocks=blocks, perm=perm,
                       inv_perm=inv_perm)


def _build_core_blocks(kept_raw, n_nodes, dtype=None, bucket=256):
    """Core-sorted leading-principal-block mirror of the kept core slots.

    K-core supports are nested (max-core-first: support(slot k) ⊆
    support(slot k+1)), so sorting nodes by "number of slots containing
    them" descending puts every slot's support at the front — slot k's
    adjacency becomes the leading n_k × n_k principal block of the permuted
    matrix.  Returns (blocks, perm, inv_perm) with blocks bucket-padded to
    multiples of ``bucket`` (zero padding is exact: padded coefficients are
    zero), or None when the supports are not nested (defensive — cannot
    happen for true k-core pyramids, reference helper.py:51-82).
    """
    level = np.zeros(n_nodes, np.int64)
    supports = []
    for m in kept_raw:
        coo = m.tocoo()
        nz = coo.data != 0
        s = np.zeros(n_nodes, bool)
        s[coo.row[nz]] = True
        s[coo.col[nz]] = True
        supports.append(s)
        level += s
    for a, b in zip(supports[:-1], supports[1:]):
        if np.any(a & ~b):
            return None
    perm = np.argsort(-level, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n_nodes, dtype=np.int32)
    blocks = []
    for m, s in zip(kept_raw, supports):
        nk = int(s.sum())
        nb = min(-(-max(nk, 1) // bucket) * bucket, n_nodes)
        coo = m.tocoo()
        nz = coo.data != 0
        r = inv[coo.row[nz]]
        c = inv[coo.col[nz]]
        if r.size and (r.max() >= nb or c.max() >= nb):
            return None
        # scatter the block ON DEVICE from the (tiny) COO: a host-built
        # [nb, nb] dense block crosses the host↔device link at far below
        # HBM bandwidth — ~1 GB/window at AS/Facebook scale (cf.
        # _densify_on_device)
        blocks.append(_scatter_block(
            jnp.asarray(r.astype(np.int32)), jnp.asarray(c.astype(np.int32)),
            jnp.asarray(coo.data[nz].astype(np.float32)), nb,
            dtype=dtype or jnp.float32))
    return tuple(blocks), jnp.asarray(perm), jnp.asarray(inv)


@functools.partial(jax.jit, static_argnums=(3,), static_argnames=("dtype",))
def _scatter_block(r, c, v, nb, dtype=jnp.float32):
    return jnp.zeros((nb, nb), dtype).at[r, c].set(v.astype(dtype))


@functools.partial(jax.jit, static_argnums=(3,), static_argnames=("dtype",))
def _densify_on_device(rows, cols, vals, n_nodes, dtype=jnp.float32):
    """[K, P] COO slots → dense [K, N, N] via batched scatter-add."""
    def one(r, c, v):
        return jnp.zeros((n_nodes, n_nodes), dtype).at[r, c].add(
            v.astype(dtype))

    return jax.vmap(one)(rows, cols, vals)


def stack_pyramids(pyramids, uniform_blocks=False):
    """Stack per-snapshot pyramids (same K, P) into [T, K, P] leaves.

    BSR plans (when present) are first padded to the window-max block count
    so their leaves stack too (padding blocks are unreachable via row_ptr).

    ``uniform_blocks`` controls the blocks-backend representation:
      * False (single-device default): tuple over t of per-snapshot block
        tuples — exact per-snapshot shapes, the model unrolls over t.
        Window-max padding costs 5.1x the MACs on the UCI window (snapshot
        core counts/sizes vary wildly), so raggedness is kept wherever
        nothing needs to shard.
      * True (mesh path): every slot padded to its window-max size and
        missing slots zero-filled — tuple over slots of [T, nb_k, nb_k]
        leaves that vmap over t and shard over the mesh's time axis
        (zero padding is exact; missing slots are masked by ``valid``)."""
    import jax

    if pyramids and pyramids[0].plan_fwd is not None:
        from ctgcn_tpu.ops.pallas_spmm import pad_block_plan

        nb_f = max(p.plan_fwd.blocks.shape[0] for p in pyramids)
        nb_t = max(p.plan_t.blocks.shape[0] for p in pyramids)
        pyramids = [
            p.replace(plan_fwd=pad_block_plan(p.plan_fwd, nb_f),
                      plan_t=pad_block_plan(p.plan_t, nb_t))
            for p in pyramids
        ]
    blocks = perm = inv = None
    if pyramids and pyramids[0].blocks is not None:
        if uniform_blocks:
            dt = pyramids[0].blocks[0].dtype
            Kb = max(len(p.blocks) for p in pyramids)
            sizes = [
                max(p.blocks[k].shape[0] for p in pyramids
                    if k < len(p.blocks))
                for k in range(Kb)
            ]

            def slot(p, k, nb):
                if k >= len(p.blocks):
                    return jnp.zeros((nb, nb), dt)
                b = p.blocks[k]
                pad = nb - b.shape[0]
                return jnp.pad(b, ((0, pad), (0, pad))) if pad else b

            blocks = tuple(
                jnp.stack([slot(p, k, sizes[k]) for p in pyramids])
                for k in range(Kb))
        else:
            blocks = tuple(p.blocks for p in pyramids)
        perm = jnp.stack([p.perm for p in pyramids])
        inv = jnp.stack([p.inv_perm for p in pyramids])
        pyramids = [p.replace(blocks=None, perm=None, inv_perm=None)
                    for p in pyramids]
    # numpy leaves (as_numpy pyramids) stay on host — np.stack; device
    # leaves stack on device
    out = jax.tree.map(
        lambda *xs: (np.stack(xs) if isinstance(xs[0], np.ndarray)
                     else jnp.stack(xs)), *pyramids)
    if blocks is not None:
        out = out.replace(blocks=blocks, perm=perm, inv_perm=inv)
    return out


def pyramid_at(stacked: CorePyramid, t: int) -> CorePyramid:
    """Slice snapshot ``t`` out of a stacked pyramid (debug/test helper;
    the model vmaps over the stacked leaves directly)."""
    import jax

    base = stacked.replace(blocks=None, perm=None, inv_perm=None)
    one = jax.tree.map(lambda l: l[t], base)
    if stacked.blocks is not None:
        ragged = isinstance(stacked.blocks[0], tuple)
        blocks = (stacked.blocks[t] if ragged
                  else tuple(b[t] for b in stacked.blocks))
        one = one.replace(blocks=blocks, perm=stacked.perm[t],
                          inv_perm=stacked.inv_perm[t])
    return one


def attach_ell_plans(stacked: CorePyramid, bf16=False, min_width=8,
                     delta=True):
    """Attach window-level degree-bucketed ELL plans (ops/ell.py) to a
    stacked [T, K, P] pyramid — the scatter-free SpMM backend for the very
    sparse regime.  Leaves carry a leading [T] axis; vmap slices them.

    ``delta`` (default): delta-encode the nested core slots so each edge
    is gathered once instead of once per containing slot — exact numerics
    up to f32 reassociation, a ~slot-multiplicity× traffic cut (see
    ops/ell.build_pyramid_ell_plans)."""
    from ctgcn_tpu.ops.ell import build_pyramid_ell_plans

    fwd, t = build_pyramid_ell_plans(stacked.rows, stacked.cols,
                                     stacked.vals, stacked.valid,
                                     stacked.n_nodes, min_width=min_width,
                                     delta=delta)
    return stacked.replace(ell_fwd=fwd, ell_t=t, ell_bf16=bf16,
                           ell_delta=delta)
