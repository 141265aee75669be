# coding: utf-8
"""Window loaders: reference helper.py DataLoader re-designed for static
shapes.

Every loader pads all snapshots of a window to a common capacity so the
window stacks into [T, ...] device arrays that jit/vmap/scan over cleanly.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ctgcn_tpu.data.formats import get_sp_adj_mat, sorted_dir
from ctgcn_tpu.losses import WalkData
from ctgcn_tpu.ops.pyramid import CorePyramid, build_core_pyramid, stack_pyramids
from ctgcn_tpu.ops.sparse import SparseGraph, from_scipy, normalize_scipy_adj
from ctgcn_tpu.utils import pad_bucket


def stack_graphs(graphs):
    """Stack equally-padded SparseGraphs into one with leading [T] axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


class DataLoader:
    """Per-window data loading (reference helper.py:12-222).

    Produces stacked device arrays rather than per-snapshot torch tensors.
    """

    def __init__(self, node_list, max_time_num):
        self.max_time_num = max_time_num
        self.full_node_list = node_list
        self.node_num = len(node_list)
        self.node2idx_dict = dict(zip(node_list, range(self.node_num)))

    def _window(self, start_idx, duration):
        return range(start_idx, min(start_idx + duration, self.max_time_num))

    # ------------------------------------------------------------------
    # adjacency
    # ------------------------------------------------------------------
    def get_scipy_adj_list(self, origin_base_path, start_idx, duration,
                           sep="\t", normalize=False, row_norm=False,
                           add_eye=False):
        """Raw/normalized scipy COO list (host side)."""
        f_list = sorted_dir(origin_base_path)
        out = []
        for i in self._window(start_idx, duration):
            spmat = get_sp_adj_mat(
                os.path.join(origin_base_path, f_list[i]),
                self.full_node_list, sep=sep)
            if add_eye:
                spmat = spmat + sp.eye(spmat.shape[0])
            if normalize:
                spmat = normalize_scipy_adj(spmat, row_norm=row_norm)
            out.append(spmat)
        return out

    # attach ELL plans to fixed-value adjacencies at/above this node count
    # ("auto" policy; below it the plain segment path is fast enough and
    # not worth the per-window plan build + retrace)
    ELL_AUTO_NODES = 16384

    def get_date_adj_list(self, origin_base_path, start_idx, duration,
                          sep="\t", normalize=False, row_norm=False,
                          add_eye=False, stacked=True, adj_backend="auto"):
        """Per-snapshot adjacency as SparseGraphs (equal capacity); when
        ``stacked`` returns a single [T]-leading SparseGraph pytree.

        ``adj_backend``: "auto" attaches degree-bucketed ELL plans
        (ops/ell.py — the scatter-free SpMM fast path, 5.6x at Facebook
        scale) when the graph is large; "ell"/"segment" force it."""
        mats = self.get_scipy_adj_list(origin_base_path, start_idx, duration,
                                       sep=sep, normalize=normalize,
                                       row_norm=row_norm, add_eye=add_eye)
        cap = pad_bucket(max((m.nnz for m in mats), default=1))
        graphs = [from_scipy(m, pad_to=cap) for m in mats]
        if not stacked:
            return graphs
        out = stack_graphs(graphs)
        use_ell = (adj_backend == "ell"
                   or (adj_backend == "auto"
                       and self.node_num >= self.ELL_AUTO_NODES))
        if use_ell:
            from ctgcn_tpu.ops.ell import (_build_uniform,
                                           build_window_ell_ev_plans)

            csrs = [m.tocsr() for m in mats]
            ev_fwd, ev_t = build_window_ell_ev_plans(
                np.asarray(out.rows), np.asarray(out.cols),
                np.asarray(out.vals) != 0, self.node_num, self.node_num)
            out = out.replace(
                ell_fwd=_build_uniform(csrs, 8),
                ell_t=_build_uniform([m.T.tocsr() for m in csrs], 8),
                ell_ev_fwd=ev_fwd, ell_ev_t=ev_t)
        return out

    def get_edge_list(self, origin_base_path, start_idx, duration, sep="\t"):
        """Host-side [2, E_t] int arrays per snapshot (both edge directions),
        the reference's ``adj._indices()`` (train.py:62)."""
        mats = self.get_scipy_adj_list(origin_base_path, start_idx, duration,
                                       sep=sep)
        return [np.stack([m.row, m.col]).astype(np.int64) for m in mats]

    # ------------------------------------------------------------------
    # k-core pyramids
    # ------------------------------------------------------------------
    def get_core_scipy_list(self, core_base_path, start_idx, duration,
                            max_core=-1):
        """Raw scipy core matrices per snapshot, max-core-first (the
        reference's truncate-to-max_core + reverse, helper.py:51-68) —
        the host-side input for partitioned-pyramid builds
        (parallel/core_partition.partition_pyramid_halo)."""
        date_dirs = sorted_dir(core_base_path)
        assert start_idx < len(date_dirs)
        out = []
        for i in self._window(start_idx, duration):
            ddir = os.path.join(core_base_path, date_dirs[i])
            f_list = sorted_dir(ddir)
            mc = len(f_list) if max_core == -1 else max_core
            f_list = f_list[:mc][::-1]  # max core first
            out.append([sp.load_npz(os.path.join(ddir, f)) for f in f_list])
        return out

    def get_core_adj_list(self, core_base_path, start_idx, duration,
                          max_core=-1, stacked=True,
                          dense_budget_bytes=4 << 30, core_backend="auto",
                          dense_dtype=None, dense_prec="highest",
                          allow_blocks=True, uniform_blocks=False):
        """K-core pyramid bank (reference helper.py:51-82 semantics:
        truncate to max_core, reverse so max core first, +I on the first,
        delta-skip as validity masks).

        Backend policy (``core_backend``):
          * ``"auto"``: dense [T, K, N, N] mirror when it fits
            ``dense_budget_bytes`` (small graphs: one batched MXU matmul
            beats everything); else degree-bucketed ELL plans (scatter-free
            gather + dense row-sum, ops/ell.py — measured 1.7-2.2x over
            the segment path on v5e at Facebook scale, where the BSR
            128x128-block bank degenerates: 0.03% fill, 14 GB, see
            data/bench_spmm_backends.json).
          * ``"dense"`` / ``"ell"`` / ``"pallas"`` / ``"segment"``: force
            one path.  ``"pallas"`` (the BSR block kernel) is DEPRECATED:
            the on-chip crossover sweep (data/bench_bsr_crossover.json)
            shows it winning no cell at any N — blocks beat it wherever
            the bank fits and ELL beyond — so auto never selects it; the
            knob remains for reproducing the sweep."""
        per_snap_mats = self.get_core_scipy_list(core_base_path, start_idx,
                                                 duration, max_core=max_core)
        num_slots = max(len(m) for m in per_snap_mats)
        # common capacity: +I on the first slot adds ≤ N entries
        max_nnz = max(
            (m.nnz + (self.node_num if j == 0 else 0))
            for mats in per_snap_mats for j, m in enumerate(mats))
        cap = pad_bucket(max_nnz)
        itemsize = 2 if dense_dtype == jnp.bfloat16 else 4
        dense_bytes = (len(per_snap_mats) * num_slots
                       * self.node_num * self.node_num * itemsize)
        build_ell = False
        build_blocks = False
        if core_backend == "auto":
            densify = (dense_budget_bytes is not None
                       and dense_bytes <= dense_budget_bytes)
            # core-sorted principal blocks beat the full dense bank
            # wherever the bank fits at all (Sum(n_k^2) << K*N^2 MACs,
            # same numerics — see CorePyramid.blocks); dense remains the
            # fallback if the support-nesting check fails (cannot for
            # true k-core pyramids).  ``uniform_blocks=True`` (the mesh
            # path) pads the banks to window-uniform shapes so blocks
            # shard over the time axis — a 5.1x MAC premium on UCI that
            # single-device runs (ragged unroll) never pay;
            # ``allow_blocks=False`` forces the dense bank.
            build_blocks = densify and allow_blocks
            densify = densify and not build_blocks
            build_plans = False
            build_ell = not (build_blocks or densify)
        else:
            assert core_backend in ("dense", "blocks", "ell", "pallas",
                                    "segment"), core_backend
            densify = core_backend == "dense"
            build_plans = core_backend == "pallas"
            build_ell = core_backend == "ell"
            build_blocks = core_backend == "blocks"
        pyramids = [
            build_core_pyramid(mats, self.node_num, num_slots=num_slots,
                               pad_to=cap, densify=densify,
                               dense_dtype=dense_dtype,
                               build_plans=build_plans,
                               dense_prec=dense_prec,
                               build_blocks=build_blocks,
                               # ELL path: keep the padded COO on host —
                               # plans build from host memory and the bank
                               # is runtime-dead afterwards; shipping it
                               # both ways through the slow relay link
                               # cost minutes per AS-scale window
                               as_numpy=build_ell)
            for mats in per_snap_mats
        ]
        if build_blocks and any(p.blocks is None for p in pyramids):
            # defensive fallback: nesting check failed somewhere — rebuild
            # the affected snapshots as full dense banks is not possible
            # per-snapshot (mixed backends don't stack), so rebuild all
            pyramids = [
                build_core_pyramid(mats, self.node_num, num_slots=num_slots,
                                   pad_to=cap, densify=True,
                                   dense_dtype=dense_dtype,
                                   dense_prec=dense_prec)
                for mats in per_snap_mats
            ]
        if not stacked:
            return pyramids
        out = stack_pyramids(pyramids, uniform_blocks=uniform_blocks)
        if build_ell:
            from ctgcn_tpu.ops.pyramid import attach_ell_plans

            out = attach_ell_plans(out, bf16=dense_dtype == jnp.bfloat16)
            # the padded [T, K, P] COO bank is runtime-dead once plans
            # exist (CoreDiffusion's ELL branch reads only ell_fwd/ell_t
            # + valid) — ship 1-wide placeholders instead of tens of MB
            T, K = np.asarray(out.valid).shape
            out = out.replace(
                rows=jnp.zeros((T, K, 1), jnp.int32),
                cols=jnp.zeros((T, K, 1), jnp.int32),
                vals=jnp.zeros((T, K, 1), jnp.float32),
                valid=jnp.asarray(out.valid))
        return out

    # ------------------------------------------------------------------
    # walk artifacts → WalkData
    # ------------------------------------------------------------------
    def get_walk_data(self, walk_pair_base_path, node_freq_base_path,
                      start_idx, duration):
        """Walk co-occurrence + frequency artifacts as padded device arrays
        (replaces reference helper.py:85-106 + the per-node Python loop in
        metrics.py:68-93)."""
        walk_files = sorted_dir(walk_pair_base_path)
        freq_files = sorted_dir(node_freq_base_path)
        degrees_t, logits_t = [], []
        max_deg = 1
        rows_list = []
        for i in self._window(start_idx, duration):
            walk_spadj = sp.load_npz(
                os.path.join(walk_pair_base_path, walk_files[i])).tolil()
            rows = walk_spadj.rows
            rows_list.append(rows)
            max_deg = max(max_deg, max((len(r) for r in rows), default=0))

            with open(os.path.join(node_freq_base_path, freq_files[i])) as fp:
                freq_list = json.load(fp)
            counts = np.bincount(np.asarray(freq_list, dtype=np.int64),
                                 minlength=self.node_num).astype(np.float64)
            with np.errstate(divide="ignore"):
                logits = np.log(counts)
            logits_t.append(logits.astype(np.float32))

        # CSR tables (losses.WalkData): the co-occurrence graph is
        # power-law (enron window 0: mean degree 4.2, max 1530), so the
        # former padded [N, deg_cap] row table was ~370x its payload —
        # 2.67 GB of per-window jit arguments at enron scale, the single
        # largest term in the first enron OOM.  The flat column ids plus
        # [N] offsets are a few MB, ship host-built in one piece, and the
        # loss pays only one extra [B] offset gather.  The flat width is
        # bucket-padded so consecutive windows reuse the compiled step.
        # Columns ship as int32 even when node_num < 2**15: the int16
        # halving would save <2 MB/window over the relay and costs a
        # device-side widen before every gather — not worth the branch.
        del max_deg
        flats, offsets_t = [], []
        width = 1
        for rows in rows_list:
            dg = np.fromiter((len(r) for r in rows), np.int32,
                             count=self.node_num)
            nnz = int(dg.sum())
            flat = np.empty(nnz, np.int32)
            pos = 0
            for r in rows:
                if len(r):
                    flat[pos:pos + len(r)] = r
                    pos += len(r)
            offsets = np.zeros(self.node_num, np.int32)
            np.cumsum(dg[:-1], out=offsets[1:])
            flats.append(flat)
            offsets_t.append(offsets)
            degrees_t.append(dg)
            width = max(width, pad_bucket(nnz, 4096))
        flat_arr = np.zeros((len(flats), width), np.int32)
        for t, flat in enumerate(flats):
            flat_arr[t, :flat.shape[0]] = flat

        return WalkData(
            nbr_flat=jnp.asarray(flat_arr),
            nbr_offsets=jnp.asarray(np.stack(offsets_t)),
            degrees=jnp.asarray(np.stack(degrees_t)),
            neg_logits=jnp.asarray(np.stack(logits_t)),
        )

    # ------------------------------------------------------------------
    # features
    # ------------------------------------------------------------------
    def get_feature_list(self, feature_base_path, start_idx, duration,
                         sep="\t"):
        """Node features: None (= identity, never materialized; the models'
        identity fast path consumes it) or zero-padded file features
        (reference helper.py:161-192)."""
        import pandas as pd

        if feature_base_path is None:
            return None, self.node_num
        feature_files = sorted_dir(feature_base_path)
        arrs = []
        for i in self._window(start_idx, duration):
            df = pd.read_csv(os.path.join(feature_base_path,
                                          feature_files[i]), sep=sep,
                             header=0)
            arrs.append(df.values)
        max_dim = max(a.shape[1] for a in arrs)
        padded = [
            np.hstack([a, np.zeros((a.shape[0], max_dim - a.shape[1]))])
            for a in arrs
        ]
        xs = jnp.asarray(np.stack(padded).astype(np.float32))
        return xs, max_dim

    def get_degree_feature_list(self, origin_base_path, start_idx, duration,
                                sep="\t", init_type="gaussian", std=1e-4,
                                rng=None):
        """Degree-based features (reference helper.py:109-158): 'gaussian'
        N(degree, std) of dim max_degree+1 (window max), 'one-hot' degree,
        'adj' rows, 'combine' gaussian ‖ adj.  Dense [T, N, D] output."""
        assert init_type in ("gaussian", "adj", "combine", "one-hot")
        rng = rng if rng is not None else np.random
        mats = self.get_scipy_adj_list(origin_base_path, start_idx, duration,
                                       sep=sep)
        degree_list = [
            np.asarray(m.sum(axis=1)).astype(np.int64).flatten() for m in mats
        ]
        max_degree = int(max(d.max() for d in degree_list))
        xs = []
        for i, degrees in enumerate(degree_list):
            if init_type == "gaussian":
                fea = rng.normal(
                    loc=degrees[:, None].astype(np.float64), scale=std,
                    size=(self.node_num, max_degree + 1))
                xs.append(fea.astype(np.float32))
            elif init_type == "one-hot":
                fea = np.zeros((self.node_num, max_degree + 1), np.float32)
                fea[np.arange(self.node_num), degrees] = 1.0
                xs.append(fea)
            elif init_type == "adj":
                xs.append(mats[i].toarray().astype(np.float32))
            else:  # combine
                fea = rng.normal(
                    loc=degrees[:, None].astype(np.float64), scale=std,
                    size=(self.node_num, max_degree + 1))
                xs.append(np.hstack(
                    [fea, mats[i].toarray()]).astype(np.float32))
        stacked = jnp.asarray(np.stack(xs))
        return stacked, int(stacked.shape[-1])

    # ------------------------------------------------------------------
    # labels
    # ------------------------------------------------------------------
    def get_node_label_list(self, nlabel_base_path, start_idx, duration,
                            sep="\t"):
        """[(node_idx, label)] per snapshot (host arrays) + n_class
        (reference helper.py:194-207)."""
        import pandas as pd

        files = sorted_dir(nlabel_base_path)
        out, labels_seen = [], set()
        for i in self._window(start_idx, duration):
            df = pd.read_csv(os.path.join(nlabel_base_path, files[i]),
                             sep=sep, header=0, names=["node", "label"])
            df["node"] = df["node"].map(self.node2idx_dict)
            labels_seen.update(df["label"].unique().tolist())
            out.append(df.values.astype(np.int64))
        return out, len(labels_seen)

    def get_edge_label_list(self, elabel_base_path, start_idx, duration,
                            sep="\t"):
        import pandas as pd

        files = sorted_dir(elabel_base_path)
        out, labels_seen = [], set()
        for i in self._window(start_idx, duration):
            df = pd.read_csv(os.path.join(elabel_base_path, files[i]),
                             sep=sep, header=0,
                             names=["from_id", "to_id", "label"])
            df["from_id"] = df["from_id"].map(self.node2idx_dict)
            df["to_id"] = df["to_id"].map(self.node2idx_dict)
            labels_seen.update(df["label"].unique().tolist())
            out.append(df.values.astype(np.int64))
        return out, len(labels_seen)
