# coding: utf-8
"""Graph-partitioned k-core pyramid diffusion across a device mesh.

Scale-out for the FLAGSHIP core methods (CGCN-C/S, CTGCN-C/S): the
reference is single-device (its answer to big snapshots is "use a bigger
GPU", reference README.md:178), and through round 3 our ``graph_partition``
config key covered only static GCN/TgGCN — a single Enron-scale snapshot
for CTGCN-C had to fit one chip.  This module row-splits the flattened
[K·N, N] pyramid product over the mesh's ``graph`` axis so one snapshot
spans chips (VERDICT r3 next-step #6; SURVEY §7.1's distribution mandate).

Key observations that make the WHOLE CoreDiffusion layer partition along
nodes, not just the SpMM:

  * every stage after the slot products — the tril-matmul prefix over core
    slots, the +I-as-"+x", the ReLU, the core-axis RNN, the output sum and
    LayerNorm — is per-node (maps over rows independently), so each chip
    runs the full tail on its own row slab with ZERO communication;
  * k-core slots are NESTED (slot k's support ⊆ slot k+1's), so
    delta-encoding the slots (Δ_k = A_k − A_{k-1}, exact for pyramids —
    same trick as ops/ell.build_pyramid_ell_plans) makes the union of all
    slot edges equal the LAST kept core's edges: ONE halo plan built from
    that union serves every slot, and one all_to_all per layer ships each
    boundary feature row exactly once for all K slot products.

Per layer and chip the only collective is the boundary all_to_all
(parts × halo_width × d values — the same exchange as
graph_partition.sharded_spmm_halo); activations live at [K, N/P, d]
instead of [K, N, d], which is what lets an Enron-scale (N=87k, K=22)
snapshot split across a pod slice.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ctgcn_tpu.utils import pad_bucket


@struct.dataclass
class PartitionedPyramid:
    """Delta-encoded core slots, destination-row partitioned, with one
    shared halo plan (see module docstring).

    Slot edges are FLATTENED across the core axis: a slot-k edge with
    slab-local destination row r is stored with row id ``k·rpp + r`` so a
    single segment_sum produces all K slot products at once.  Column ids
    are pre-remapped host-side: LOCAL edges index the chip's own x slab,
    REMOTE edges index the flattened [parts·H, d] all_to_all receive
    buffer.  ``halo_send[q, p, :]`` lists the q-local x rows chip q ships
    to chip p (padding repeats row 0 — receivers never read padded slots).

    Leaves (leading [parts] axis shards over the mesh):
      local_rows/local_cols/local_vals: [P, capL]
      remote_rows/remote_idx/remote_vals: [P, capR]
      halo_send: [P, P, H]
      valid: bool[K] — delta-skip mask (reference helper.py:74-76)
    """

    local_rows: jnp.ndarray
    local_cols: jnp.ndarray
    local_vals: jnp.ndarray
    remote_rows: jnp.ndarray
    remote_idx: jnp.ndarray
    remote_vals: jnp.ndarray
    halo_send: jnp.ndarray
    valid: jnp.ndarray
    rows_per_part: int = struct.field(pytree_node=False)
    n_nodes: int = struct.field(pytree_node=False)
    halo_width: int = struct.field(pytree_node=False)
    num_slots: int = struct.field(pytree_node=False)

    @property
    def parts(self) -> int:
        return int(self.local_rows.shape[0])

    @property
    def n_rows(self) -> int:
        return self.parts * self.rows_per_part


def partition_pyramid_halo(core_mats, n_nodes, n_parts,
                           num_slots=None) -> PartitionedPyramid:
    """scipy core matrices (max-core-first, as read from the core_folder —
    the caller applies the reference's truncate-to-max_core + reverse,
    helper.py:51-68) → delta slots partitioned over ``n_parts`` (host).

    Mirrors build_core_pyramid's kept/delta-skip semantics: a core whose
    delta vs the previous kept core is empty is dropped (valid=False slot);
    the slot-0 +I is NOT materialized — the layer adds it back as "+x"
    (every prefix row contains slot 0, so +x applies to all rows — same
    math as the delta-ELL branch of nn.core_models.CoreDiffusion).
    """
    import scipy.sparse as sp

    kept = []
    prev = None
    for j, mat in enumerate(core_mats):
        mat = mat.tocsr()
        if j > 0 and prev is not None:
            if abs(mat - prev).sum() == 0:
                prev = mat
                continue
        kept.append(mat)
        prev = mat
    K = int(num_slots) if num_slots is not None else max(len(kept), 1)
    assert len(kept) <= K
    valid = np.zeros(K, bool)
    valid[: len(kept)] = True

    deltas = [kept[0]] + [
        (kept[k] - kept[k - 1]).tocoo() for k in range(1, len(kept))
    ]
    union = kept[-1] if kept else sp.coo_matrix((n_nodes, n_nodes))

    rows_per_part = -(-(-(-n_nodes // n_parts)) // 8) * 8

    # shared halo plan from the union graph's binary pattern
    uc = union.tocoo()
    unz = uc.data != 0
    ur = uc.row[unz].astype(np.int64)
    ucol = uc.col[unz].astype(np.int64)
    upart = ur // rows_per_part
    ucpart = ucol // rows_per_part
    halo_cols = {}
    for p in range(n_parts):
        sel = (upart == p) & (ucpart != p)
        if not sel.any():
            continue
        for q in np.unique(ucpart[sel]):
            qsel = sel & (ucpart == q)
            halo_cols[(int(q), p)] = np.unique(ucol[qsel])
    H = max((len(v) for v in halo_cols.values()), default=1)
    halo_send = np.zeros((n_parts, n_parts, H), np.int32)
    for (q, p), cols_qp in halo_cols.items():
        halo_send[q, p, : len(cols_qp)] = cols_qp - q * rows_per_part

    # flatten delta slots into per-part local/remote edge lists
    loc = {p: ([], [], []) for p in range(n_parts)}   # rows, cols, vals
    rem = {p: ([], [], []) for p in range(n_parts)}
    for k, d in enumerate(deltas):
        coo = d.tocoo()
        nz = coo.data != 0
        r = coo.row[nz].astype(np.int64)
        c = coo.col[nz].astype(np.int64)
        v = coo.data[nz].astype(np.float32)
        part = r // rows_per_part
        cpart = c // rows_per_part
        flat_r = k * rows_per_part + (r % rows_per_part)
        is_local = part == cpart
        for p in range(n_parts):
            psel = part == p
            lsel = psel & is_local
            loc[p][0].append(flat_r[lsel])
            loc[p][1].append(c[lsel] % rows_per_part)
            loc[p][2].append(v[lsel])
            rsel = psel & ~is_local
            if rsel.any():
                slot = np.empty(int(rsel.sum()), np.int64)
                ridx = np.flatnonzero(rsel)
                for q in np.unique(cpart[ridx]):
                    esel = cpart[ridx] == q
                    cols_qp = halo_cols[(int(q), p)]
                    slot[esel] = q * H + np.searchsorted(cols_qp,
                                                         c[ridx[esel]])
                rem[p][0].append(flat_r[rsel])
                rem[p][1].append(slot)
                rem[p][2].append(v[rsel])

    def pack(per_part, n_rows_flat):
        cat = {p: tuple(np.concatenate(a) if a else np.zeros(0)
                        for a in abc) for p, abc in per_part.items()}
        cap = pad_bucket(max((len(c[0]) for c in cat.values()), default=1))
        rows_a = np.full((n_parts, cap), n_rows_flat - 1, np.int32)
        cols_a = np.zeros((n_parts, cap), np.int32)
        vals_a = np.zeros((n_parts, cap), np.float32)
        for p, (rr, cc, vv) in cat.items():
            # sort by flattened row so segment_sum sees sorted indices;
            # padding (val 0) targets the LAST row to keep the order
            order = np.argsort(rr, kind="stable")
            n = len(rr)
            rows_a[p, :n] = rr[order]
            cols_a[p, :n] = cc[order]
            vals_a[p, :n] = vv[order]
        return rows_a, cols_a, vals_a

    KR = K * rows_per_part
    l_rows, l_cols, l_vals = pack(loc, KR)
    r_rows, r_idx, r_vals = pack(rem, KR)

    return PartitionedPyramid(
        local_rows=jnp.asarray(l_rows), local_cols=jnp.asarray(l_cols),
        local_vals=jnp.asarray(l_vals), remote_rows=jnp.asarray(r_rows),
        remote_idx=jnp.asarray(r_idx), remote_vals=jnp.asarray(r_vals),
        halo_send=jnp.asarray(halo_send), valid=jnp.asarray(valid),
        rows_per_part=int(rows_per_part), n_nodes=int(n_nodes),
        halo_width=int(H), num_slots=K)


def partitioned_core_diffusion(mesh, layer, x, ppyr: PartitionedPyramid,
                               axis="graph"):
    """One CoreDiffusion layer with every stage node-partitioned.

    x: [n_rows, d] (logically full; row-sharded under jit — shard_map
    splits/joins at the boundary, and consecutive calls with matching
    specs leave the data in place).  Returns [n_rows, out].

    Matches nn.core_models.CoreDiffusion's delta-ELL branch numerics up to
    f32 reduction order: contribs[k] = Δ_k @ x, prefix via the exact
    (L·L) tril matmul, +x for the slot-0 +I, ReLU+mask, core-axis RNN with
    packed-sequence masking, sum over slots, LayerNorm.
    """
    from ctgcn_tpu.ops.rnn import LSTMCell, rnn_scan

    K = ppyr.num_slots
    rpp = ppyr.rows_per_part

    def local_fn(layer, valid, l_rows, l_cols, l_vals, r_rows, r_idx,
                 r_vals, send, x_shard):
        d = x_shard.shape[-1]
        send_buf = x_shard[send[0]]                      # [P, H, d]
        recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        out_local = jax.ops.segment_sum(
            x_shard[l_cols[0]] * l_vals[0][:, None], l_rows[0],
            num_segments=K * rpp, indices_are_sorted=True)
        recv_flat = recv.reshape(-1, d)
        out_remote = jax.ops.segment_sum(
            recv_flat[r_idx[0]] * r_vals[0][:, None], r_rows[0],
            num_segments=K * rpp, indices_are_sorted=True)
        contribs = (out_local + out_remote).reshape(K, rpp, d)
        contribs = contribs * valid[:, None, None]
        # delta slots: A_j @ x = Σ_{i≤j} Δ_i @ x, prefix over j → L·L;
        # +x restores the slot-0 +I on every prefix row (L[k,0]=1 ∀k)
        lower = jnp.tril(jnp.ones((K, K), jnp.float32))
        lower = jnp.matmul(lower, lower,
                           precision=jax.lax.Precision.HIGHEST)
        acc = jax.lax.dot_general(
            lower, contribs, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        acc = acc + x_shard.astype(jnp.float32)[None]
        hx = jax.nn.relu(acc) * valid[:, None, None]
        # the scan carry must be marked varying along the manual mesh axis
        # or shard_map rejects the scan (carry in/out vma mismatch)
        h0 = jax.lax.pcast(jnp.zeros((rpp, layer.rnn.hidden_dim), hx.dtype),
                           (axis,), to="varying")
        carry0 = (h0, h0) if isinstance(layer.rnn, LSTMCell) else h0
        outs, _ = rnn_scan(layer.rnn, hx, mask=valid, h0=carry0)
        return layer.norm(outs.sum(axis=0))

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(layer, ppyr.valid, ppyr.local_rows, ppyr.local_cols,
              ppyr.local_vals, ppyr.remote_rows, ppyr.remote_idx,
              ppyr.remote_vals, ppyr.halo_send, x)


def halo_core_forward(mesh, model, xs, ppyrs, node_num, key=None,
                      axis="graph"):
    """CGCN/CTGCN window forward with every CoreDiffusion layer partitioned
    over the mesh's ``graph`` axis.

    model: nn.core_models.CGCN (shared per-t params) or CTGCN (leading-[T]
    stacked params + time RNN); xs: [T, N, in] or None (identity features);
    ppyrs: tuple over t of PartitionedPyramid (per-snapshot capacities
    differ, so snapshots loop).  Returns the model's own convention:
    [T, N, out] for 'C', (embs, trans) for 'S'.
    """
    from ctgcn_tpu.nn.core_models import CTGCN, _mlp_maybe_identity
    from ctgcn_tpu.ops.rnn import rnn_scan

    is_ctgcn = isinstance(model, CTGCN)
    T = len(ppyrs)
    embs, transs = [], []
    for t, ppyr in enumerate(ppyrs):
        if is_ctgcn:
            mlp_t = jax.tree.map(lambda l: l[t], model.mlps)
            cdn_t = jax.tree.map(lambda l: l[t], model.cdns)
        else:
            mlp_t, cdn_t = model.mlp, model.cdn
        x = None if xs is None else xs[t]
        trans = _mlp_maybe_identity(mlp_t, x)            # [N, d]
        pad = ppyr.n_rows - trans.shape[0]
        h = jnp.pad(trans, ((0, pad), (0, 0))) if pad else trans
        for layer in cdn_t.layers:
            h = partitioned_core_diffusion(mesh, layer, h, ppyr, axis=axis)
        embs.append(h[:node_num])
        transs.append(trans)
    hx = jnp.stack(embs)
    trans = jnp.stack(transs)
    if is_ctgcn:
        # time-axis RNN + LayerNorm (models.py:240-253) — per-node ops on
        # the assembled [T, N, out]; N·T·d is small next to the partitioned
        # [K, N, d] layer internals, so this stage stays unpartitioned
        outs, _ = rnn_scan(model.rnn, hx)
        hx = model.norm(outs)
    if model.model_type == "S":
        return hx, trans
    return hx
