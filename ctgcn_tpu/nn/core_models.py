# coding: utf-8
"""The CTGCN model family: CoreDiffusion, CDN, CGCN, CTGCN.

TPU-first re-design of reference layers.py:9-63 and models.py:8-42,129-253:

  * the per-core Python loop with its prefix-sum accumulation
    (reference layers.py:41-47) becomes a masked ``lax.scan`` over the fixed
    core-slot bank of a :class:`~ctgcn_tpu.ops.pyramid.CorePyramid`;
  * the core-axis GRU/LSTM + sum + LayerNorm (layers.py:58-62) runs via
    ``rnn_scan`` with the pyramid's validity mask (packed-seq semantics);
  * CGCN applies one shared MLP+CDN per snapshot via ``vmap`` over time;
  * CTGCN keeps per-timestep *distinct* MLP+CDN parameters
    (models.py:222-231) by stacking parameter pytrees along a leading time
    axis and ``vmap``-ing over them, then runs the time-axis RNN + LayerNorm
    (models.py:240-253);
  * identity node features (the common CGCN-C/CTGCN-C configuration, where
    x = I and input_dim = N) never materialize the N×N identity: passing
    ``x=None`` makes the first Linear return its weight matrix directly.
"""
from __future__ import annotations

import os

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import MLP, LayerNorm
from ctgcn_tpu.ops.pyramid import CorePyramid
from ctgcn_tpu.ops.rnn import GRUCell, LSTMCell, core_rnn_sum, rnn_scan


def _make_rnn(key, rnn_type, input_dim, hidden_dim, bias=True):
    assert rnn_type in ("GRU", "LSTM")
    cls = GRUCell if rnn_type == "GRU" else LSTMCell
    return cls.init(key, input_dim, hidden_dim, bias=bias)


def _act_budget_bytes():
    """Activation budget steering the multi-snapshot execution strategy.
    Below it, all T snapshots run batched under vmap (best MXU
    utilization); above it, snapshots serialize through lax.map with
    jax.checkpoint so the backward rematerializes one snapshot's
    core-diffusion internals at a time (the reference answers this regime
    with "use a bigger GPU", README.md:178 — a Facebook-scale window at
    the reference's own config needs ~27 GB of activations vs the 16 GB
    v5e HBM).  Read at trace time so benches/tests can A/B it."""
    return int(os.environ.get("CTGCN_TPU_ACT_BUDGET", 4 << 30))


def _remat(fn):
    """Over-budget remat policy (read at trace time): "full" (default)
    recomputes everything in backward — the only footprint that fits a
    Facebook-scale window on a 16 GB v5e.  "save_spmm" keeps each
    snapshot's SpMM outputs resident and recomputes only the cheap
    prefix/ReLU/GRU internals — faster where HBM allows (e.g. v5p/v6e or
    smaller windows)."""
    if os.environ.get("CTGCN_TPU_REMAT_POLICY", "full") == "save_spmm":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                "spmm_out"))
    return jax.checkpoint(fn)


def _core_rnn_budget_bytes():
    """Residual budget for one CoreDiffusion layer's ReLU+core-axis-RNN
    tail.  Above it, the layer switches from the batched tail (hx/gi_all
    and per-gate internals all materialized at [K, N, *] as backward
    residuals) to a checkpointed lax.scan over the core axis whose
    backward keeps only ``acc`` plus the [K, N, H] carries — measured
    2.3 GB -> 0.9 GB per Facebook-scale snapshot, the difference between
    a T=5 window OOMing and fitting a 16 GB v5e.  Read at trace time."""
    return int(os.environ.get("CTGCN_TPU_CORE_RNN_BUDGET", 512 << 20))


def _prefix_acc(contribs, delta, xp):
    """Materialize the k-core prefix acc [K, N, d] from the slot products.

    A lower-triangular [K, K] matmul rather than jnp.cumsum: the cumsum
    forces XLA into a different [T, K, N, d] layout than the SpMM/GRU
    dots around it, costing ~5 ms/step of pure relayout copies at UCI
    scale (profiled v5e); the matmul form stays in the dot pipeline's
    layout.  K <= 22 so the extra K^2 N d FLOPs are noise at any scale.

    ``delta``: slots are Δ-encoded (contribs[k] = Δ_k @ x), so slot
    products are A_j @ x = Σ_{i≤j} Δ_i @ x and the masked prefix becomes
    acc_k = Σ_{j≤k} A_j @ x = (L·L) @ contribs (exact — L entries are
    small ints); the +I the bank baked into slot 0 comes back as "+ xp"."""
    K = contribs.shape[0]
    lower = jnp.tril(jnp.ones((K, K), jnp.float32))
    if delta:
        lower = jnp.matmul(lower, lower,
                           precision=jax.lax.Precision.HIGHEST)
    acc = jax.lax.dot_general(
        lower.astype(contribs.dtype), contribs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(None if contribs.dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST))
    if delta:
        acc = acc + xp.astype(jnp.float32)[None]
    return acc


def _acc_materialize_budget_bytes():
    """Byte gate for materializing the [K, N, d] prefix ``acc`` ahead of
    the over-budget scan tail.  The default (8 GB) effectively always
    materializes: the fused-prefix alternative measured WORSE on both
    axes on chip (r4) — slower backward (+0.3 s on the Facebook-scale
    step: the per-step prefix adds serialize into the checkpointed-step
    recompute) AND no memory win, because ``lax.scan``'s VJP stacks the
    per-step carries, so the [N, d] running sums come back as TWO
    [K, N, d] f32 stacks (measured 2×3.59 G at Enron scale).  What
    actually fits Enron is bf16 acc STORAGE (the cast in _tail), not
    prefix fusion.  Lower the env var to force the fused form for
    study.  Read at trace time."""
    return int(os.environ.get("CTGCN_TPU_ACC_MATERIALIZE_BUDGET", 8 << 30))


def _core_rnn_scan_acc(cell, acc, valid):
    """Over-budget scan tail over a PRE-MATERIALIZED prefix ``acc``
    ([K, N, d]): relu+mask+RNN as one checkpointed scan (backward
    residuals = acc + inter-step carries)."""
    n = acc.shape[1]
    H = cell.hidden_dim
    is_lstm = isinstance(cell, LSTMCell)
    h0 = jnp.zeros((n, H), jnp.float32)
    carry0 = (h0, h0) if is_lstm else h0
    valid = valid.astype(bool)

    @jax.checkpoint
    def step(carry, inp):
        acc_k, v = inp
        hx = jax.nn.relu(acc_k.astype(jnp.float32)) * v
        new = cell(carry, hx)
        if is_lstm:
            new = tuple(jnp.where(v, nw, old)
                        for nw, old in zip(new, carry))
            out = jnp.where(v, new[0], 0.0)
        else:
            new = jnp.where(v, new, carry)
            out = jnp.where(v, new, 0.0)
        return new, out

    _, outs = jax.lax.scan(step, carry0, (acc, valid))
    return outs


def _core_rnn_scan_remat(cell, contribs, valid, delta=False, xp=None):
    """Fused-prefix tail of CoreDiffusion: prefix accumulation + relu+mask
    + RNN over the core axis as one checkpointed scan.

    KEPT FOR STUDY ONLY (force via CTGCN_TPU_ACC_MATERIALIZE_BUDGET=0):
    measured on chip (r4) it loses to the materialized-acc scan on both
    speed (+0.3 s backward on the Facebook-scale step — the per-step
    prefix adds serialize into the checkpointed-step recompute) and
    memory (``lax.scan``'s VJP stacks the per-step carries, so the
    [N, d] running sums come back as TWO [K, N, d] f32 stacks — 2×3.59 G
    at Enron scale, observed in the OOM dump).  Numerically equivalent
    (up to f32 reassociation) to materializing ``acc = L @ contribs``
    (or ``(L·L) @ contribs + xp`` for delta-encoded slots) and running
    ``rnn_scan(cell, relu(acc)*valid, mask=valid)``.

    ``delta``: contribs[k] = Δ_k @ x (ops/ell.build_pyramid_ell_plans), so
    the slot product A_k_raw @ x is itself a prefix — two nested running
    sums (s_k = s_{k-1} + c_k; acc_k = acc_{k-1} + s_k, acc initialized to
    ``xp`` = the +I the bank baked into slot 0, reference helper.py:71-73).
    An invalid (delta-skip) slot has c_k = 0 → both sums pass through,
    which IS the reference's skip."""
    n = contribs.shape[1]
    H = cell.hidden_dim
    is_lstm = isinstance(cell, LSTMCell)
    h0 = jnp.zeros((n, H), jnp.float32)
    rnn0 = (h0, h0) if is_lstm else h0
    valid = valid.astype(bool)
    # running sums carry f32 regardless of the contribs storage dtype
    # (bf16 under the ell_bf16 knob): each step upcasts its slot product
    sum0 = jnp.zeros(contribs.shape[1:], jnp.float32)
    if delta:
        acc0 = xp.astype(jnp.float32)
        carry0 = (rnn0, sum0, acc0)
    else:
        carry0 = (rnn0, sum0)

    @jax.checkpoint
    def step(carry, inp):
        c_k, v = inp
        c_k = c_k.astype(jnp.float32)
        if delta:
            rnnc, s, acc = carry
            s = s + c_k
            acc = acc + s
        else:
            rnnc, acc = carry
            acc = acc + c_k
        hx = jax.nn.relu(acc) * v
        new = cell(rnnc, hx)
        if is_lstm:
            new = tuple(jnp.where(v, nw, old)
                        for nw, old in zip(new, rnnc))
            out = jnp.where(v, new[0], 0.0)
        else:
            new = jnp.where(v, new, rnnc)
            out = jnp.where(v, new, 0.0)
        return ((new, s, acc) if delta else (new, acc)), out

    _, outs = jax.lax.scan(step, carry0, (contribs, valid))
    return outs


def _window_act_bytes(cdn, pyramids):
    """Rough forward-activation footprint of the batched [T] window: the
    [K, N, d_in] contribs/prefix/relu plus [K, N, 3H+H] GRU tensors per
    CoreDiffusion layer dominate everything else."""
    T = pyramids.valid.shape[0]
    K = pyramids.valid.shape[1]
    n = pyramids.n_nodes
    # shape[-1] deliberately: CTGCN's cdn leaves carry a leading [T] axis,
    # so shape[-1] reads the true feature dim for both CGCN and CTGCN.
    per_node = sum(3 * layer.rnn.w_ih.shape[-1] + 4 * layer.rnn.w_hh.shape[-1]
                   for layer in cdn.layers)
    return 4 * T * K * n * per_node


def _mlp_maybe_identity(mlp: MLP, x):
    """Apply an MLP where ``x=None`` means identity features (x = I_N)."""
    if x is None:
        first = mlp.layers[0]
        h = first.weight if first.bias is None else first.weight + first.bias
        if mlp.activate_type == "N":
            h = jax.nn.selu(h)
        for lin in mlp.layers[1:]:
            h = lin(h)
            if mlp.activate_type == "N":
                h = jax.nn.selu(h)
        return h
    return mlp(x)


@struct.dataclass
class CoreDiffusion:
    """K-core diffusion layer (reference layers.py:9-63).

    h_k = h_{k-1} + A_k @ x accumulated over valid core slots (max core
    first), ReLU'd per step, then a 1-layer RNN over the core axis whose
    outputs are summed and LayerNorm'd.
    """

    rnn: GRUCell | LSTMCell
    norm: LayerNorm

    @staticmethod
    def init(key, input_dim, output_dim, bias=True, rnn_type="GRU"):
        return CoreDiffusion(
            rnn=_make_rnn(key, rnn_type, input_dim, output_dim, bias=bias),
            norm=LayerNorm.init(output_dim),
        )

    def _contribs(self, x, pyramid: CorePyramid):
        """The K per-slot SpMM products ([K, n, d] f32, +I folded in,
        valid-masked, checkpoint-named) plus ``xp`` — the input in the
        backend's node order (blocks permute; the delta tail re-adds it).
        No layer parameters are read here: the contribs depend only on the
        pyramid and ``x``, which is what lets the ragged-blocks window
        driver compute them per snapshot while batching the parametrized
        tail across T (see _ragged_blocks_cdn_window)."""
        n = pyramid.n_nodes
        K = pyramid.num_slots

        if pyramid.blocks is not None:
            # core-sorted principal blocks: Sum(n_k^2) MACs instead of
            # K*N^2 (48x less on UCI — ops/pyramid._build_core_blocks).
            # All node-wise stages downstream (prefix sum, ReLU, core-axis
            # RNN, LayerNorm) are permutation-equivariant, so the whole
            # layer runs in core-sorted order and un-permutes once at the
            # end.
            is_bf16 = pyramid.blocks[0].dtype == jnp.bfloat16
            prec = (None if is_bf16
                    else jax.lax.Precision.HIGH
                    if pyramid.dense_prec == "high"
                    else jax.lax.Precision.HIGHEST)
            xp = jnp.take(x, pyramid.perm, axis=0)
            xb = xp.astype(pyramid.blocks[0].dtype)
            contribs = jnp.zeros((K, n, x.shape[1]), jnp.float32)
            for k, blk in enumerate(pyramid.blocks):
                nb = blk.shape[0]
                r = jax.lax.dot_general(
                    blk, xb[:nb], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                contribs = contribs.at[k, :nb].set(r.astype(jnp.float32))
            # the +I the reference adds on the max-core slot only
            # (helper.py:71-73) — as "+ x", never materializing I
            contribs = contribs.at[0].add(xp)
        elif pyramid.dense is not None:
            # one batched MXU matmul: [K, N, N] @ [N, d].  An f32 bank runs
            # HIGHEST precision — full-f32 numerics (default bf16 passes
            # drift ~0.3% on high-degree rows, breaking reference parity).
            # A bf16 bank (config ``matmul_precision: "bf16"``) runs
            # single-pass bf16 with f32 accumulation: ~same AUC, much
            # faster and half the HBM traffic on the bank.
            # ``dense_prec: "high"`` (config ``matmul_precision: "high"``)
            # keeps the f32 bank but runs 3-pass bf16_3x dots: ~1.75x the
            # HIGHEST (6-pass) MXU rate at ~3.5e-6 mean rel err (v5e,
            # data/bench_precision.json) — the near-exact middle ground.
            is_bf16 = pyramid.dense.dtype == jnp.bfloat16
            prec = (None if is_bf16
                    else jax.lax.Precision.HIGH
                    if pyramid.dense_prec == "high"
                    else jax.lax.Precision.HIGHEST)
            contribs = jax.lax.dot_general(
                pyramid.dense, x.astype(pyramid.dense.dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            contribs = contribs.astype(jnp.float32)
        elif pyramid.ell_fwd is not None:
            # degree-bucketed ELL: gather + dense row-sum, no scatter — the
            # fast path for very sparse large graphs (ops/ell.py; measured
            # 1.7x f32 / 2.2x bf16 over segment_sum on v5e)
            from ctgcn_tpu.ops.ell import ell_spmm

            contribs = ell_spmm(pyramid.ell_fwd, pyramid.ell_t,
                                x.astype(jnp.float32),
                                pyramid.ell_bf16).reshape(K, n, -1)
            if pyramid.ell_bf16:
                # bf16 knob also STORES the slot products in bf16 (sums
                # still accumulate f32 inside the gather kernel; the tail
                # prefix accumulates f32 carries).  This halves the three
                # [K, N, d] giants of the remat backward — contribs, its
                # cotangent, and XLA's layout copy — which is what lets an
                # Enron-scale snapshot (K=22, N=87k: 3×3.6 GB in f32, OOM
                # at 24.3/15.75 GB) fit the 16 GB v5e at all.
                contribs = contribs.astype(jnp.bfloat16)
        elif pyramid.plan_fwd is not None:
            # Pallas BSR: all K slot products as one block-diagonal kernel
            # call (the large-graph regime where [K, N, N] dense is
            # unaffordable; see ops/pallas_spmm.build_pyramid_plans)
            from ctgcn_tpu.ops.pallas_spmm import pyramid_spmm

            contribs = pyramid_spmm(
                pyramid.plan_fwd, pyramid.plan_t, x.astype(jnp.float32),
                K, n, interpret=jax.default_backend() == "cpu")
        else:
            # one flattened gather + segment-sum over all K slots
            flat_cols = pyramid.cols.reshape(-1)
            flat_vals = pyramid.vals.reshape(-1)
            offsets = (jnp.arange(K, dtype=pyramid.rows.dtype) * n)[:, None]
            flat_rows = (pyramid.rows + offsets).reshape(-1)
            gathered = x[flat_cols] * flat_vals[:, None]
            contribs = jax.ops.segment_sum(
                gathered, flat_rows, num_segments=K * n,
                indices_are_sorted=True).reshape(K, n, -1)

        # named so the budget-remat path can keep SpMM outputs while
        # rematerializing the cheap prefix/ReLU/GRU internals — recomputing
        # the gathers in backward cost ~2x at Facebook scale
        contribs = jax.ad_checkpoint.checkpoint_name(contribs, "spmm_out")
        contribs = contribs * pyramid.valid[:, None, None]
        xp_out = xp if pyramid.blocks is not None else x
        return contribs, xp_out

    def _tail(self, contribs, valid, delta, xp, t_batch=1):
        """prefix accumulation + ReLU + core-axis RNN + LayerNorm on the
        [K, n, d] contribs.  ``delta``: the contribs are Δ-encoded ELL
        products (reconstruct prefixes with L·L and re-add the +I as
        "+ xp").  ``t_batch``: how many instances run batched under vmap —
        scales the residual-budget check for the T-batched window tail."""
        K = contribs.shape[0]
        n = contribs.shape[1]
        d_in = contribs.shape[-1]
        H = self.rnn.hidden_dim
        # LSTM tails materialize 4H gate projections plus both h and c
        # carries (~9H per node) vs the GRU's 3H + h (~7H)
        per_h = 9 if isinstance(self.rnn, LSTMCell) else 7
        tail_bytes = 4 * K * n * (2 * d_in + per_h * H) * t_batch
        # the T-batched window tail's residuals are window-scoped — gate
        # them on the window activation budget (the per-snapshot knob
        # guards the serialized lax.map/ELL path, where it bounds ONE
        # snapshot's recompute residuals at a time)
        budget = (_act_budget_bytes() if t_batch > 1
                  else _core_rnn_budget_bytes())
        acc_bytes = contribs.dtype.itemsize * K * n * d_in * t_batch
        if (os.environ.get("CTGCN_TPU_CORE_VJP", "1") == "1"
                and acc_bytes <= _acc_materialize_budget_bytes()):
            # hand-written VJP (ops/rnn.core_rnn_sum): materialize acc
            # once (bf16 when the contribs are bf16 and the tail is
            # over-budget), save only acc + the [K, N, H] pre-step
            # carries in acc.dtype, and emit the masked SUM directly —
            # the [K, N, H] outs stack, its cotangent, and XLA's remat
            # layout copies of acc (3×1.8 GB at Enron scale) all vanish.
            acc = _prefix_acc(contribs, delta, xp)
            if contribs.dtype == jnp.bfloat16 and tail_bytes > budget:
                acc = acc.astype(jnp.bfloat16)
            out = core_rnn_sum(self.rnn, acc,
                               valid.astype(jnp.float32))
            return self.norm(out)
        if tail_bytes > budget:
            if acc_bytes <= _acc_materialize_budget_bytes():
                # acc fits: materialize the prefix (one MXU tril matmul)
                # and scan over it — faster backward than the fused form.
                # bf16 contribs store acc in bf16 too (accumulated f32 in
                # the dot): acc + its cotangent at Enron scale are
                # 2×1.8 GB instead of 2×3.6 GB — with the RNN carry stack
                # ([K, N, H]) the only other per-step residual, this is
                # the configuration that fits the largest reference
                # regime on a 16 GB chip
                acc = _prefix_acc(contribs, delta, xp)
                if contribs.dtype == jnp.bfloat16:
                    acc = acc.astype(jnp.bfloat16)
                outs = _core_rnn_scan_acc(self.rnn, acc, valid)
            else:
                # fused-prefix experiment (measured worse both ways —
                # see _core_rnn_scan_remat docstring)
                outs = _core_rnn_scan_remat(self.rnn, contribs, valid,
                                            delta, xp)
        else:
            acc = _prefix_acc(contribs, delta, xp)
            hx = jax.nn.relu(acc) * valid[:, None, None]
            # hx: [K, N, in]; RNN over core axis with packed-seq masking
            outs, _ = rnn_scan(self.rnn, hx, mask=valid)
        return self.norm(outs.sum(axis=0))

    def __call__(self, x, pyramid: CorePyramid):
        """The reference's sequential per-core loop (layers.py:41-47) is a
        prefix sum of independent per-core SpMMs — here all K products run
        as one batched op, then a cumulative sum along the core axis (an
        invalid slot contributes zero, which IS the pass-through)."""
        contribs, xp = self._contribs(x, pyramid)
        delta = pyramid.ell_fwd is not None and pyramid.ell_delta
        out = self._tail(contribs, pyramid.valid, delta, xp)
        if pyramid.blocks is not None:
            out = jnp.take(out, pyramid.inv_perm, axis=0)
        return out


def _batch_window_tail():
    """Whether the ragged-blocks path batches the core-RNN tail across
    time (``_ragged_blocks_cdn_window``).  Default OFF: on-chip A/B on
    the UCI CTGCN-C step (v5e, r4) measured the T-batched tail at
    44.4 ms f32 / 42.9 bf16 vs 38.9 / 36.7 for the per-snapshot unrolled
    form — the batched forward is faster (8.4 ms per-timestep fwd) but
    its backward loses more than the forward gains (the T-batched GEMM
    scan backward runs below the many-small-scans form at this size).
    Kept behind ``CTGCN_TPU_BATCH_WINDOW_TAIL=1`` for re-probing on
    other topologies.  Read at trace time."""
    return os.environ.get("CTGCN_TPU_BATCH_WINDOW_TAIL", "0") == "1"


def _ragged_blocks_cdn_window(cdn, h, pyramids, stacked_params):
    """All T snapshots of a ragged-blocks window through one CDN, with the
    tail batched across time.

    The blocks backend keeps exact per-snapshot block shapes (window-max
    padding costs 5.1x the MACs on UCI — ops/pyramid.stack_pyramids), so
    the SpMMs must stay unrolled over t.  But the prefix/ReLU/core-RNN/
    LayerNorm tail has UNIFORM [K, N, d] shapes across t, and unrolling it
    too made every window run 2·T·L separate K-step core-axis scans
    (T=7, L=2, K=16 on UCI: ~224 sequential GRU steps — the dominant cost
    of the latency-bound small-graph train step).  Here each layer runs
    ONE tail vmapped over t (2·L scans, ~32 sequential steps): identical
    math, T-batched matmuls.

    ``stacked_params``: the CDN's leaves carry a leading [T] axis (CTGCN's
    per-timestep distinct parameters, reference models.py:222-231) — the
    tail vmaps over them; otherwise one parameter set is shared across t
    (CGCN).  Returns [T, N, out] in original node order.
    """
    from ctgcn_tpu.ops.pyramid import pyramid_at

    T = len(pyramids.blocks)
    for li in range(len(cdn.layers)):
        layer = cdn.layers[li]
        cs = []
        for t in range(T):
            p = pyramid_at(pyramids, t)
            layer_t = (jax.tree.map(lambda l: l[t], layer)
                       if stacked_params else layer)
            c, _ = layer_t._contribs(h[t], p)
            cs.append(c)
        contribs = jnp.stack(cs)                       # [T, K, N, d]
        if stacked_params:
            outs = jax.vmap(
                lambda lyr, c, v: lyr._tail(c, v, False, None, t_batch=T)
            )(layer, contribs, pyramids.valid)
        else:
            outs = jax.vmap(
                lambda c, v: layer._tail(c, v, False, None, t_batch=T)
            )(contribs, pyramids.valid)
        # per-t un-permute back to node order (perm differs per snapshot)
        h = jnp.take_along_axis(outs, pyramids.inv_perm[:, :, None], axis=1)
    return h


@struct.dataclass
class CDN:
    """K-core diffusion network: a stack of CoreDiffusion layers
    (reference models.py:8-42)."""

    layers: tuple  # tuple of CoreDiffusion

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, diffusion_num, bias=True,
             rnn_type="GRU"):
        assert diffusion_num > 0
        keys = jax.random.split(key, diffusion_num)
        if diffusion_num == 1:
            dims = [(input_dim, output_dim)]
        else:
            dims = ([(input_dim, hidden_dim)]
                    + [(hidden_dim, hidden_dim)] * (diffusion_num - 2)
                    + [(hidden_dim, output_dim)])
        layers = tuple(
            CoreDiffusion.init(keys[i], d_in, d_out, bias=bias,
                               rnn_type=rnn_type)
            for i, (d_in, d_out) in enumerate(dims)
        )
        return CDN(layers=layers)

    def __call__(self, x, pyramid):
        # CTGCN_TPU_LAYER_REMAT=1 (config key ``layer_remat``) wraps each
        # CoreDiffusion layer in its own checkpoint so one layer's tail
        # residuals (acc + carries, ~4.4 GB/layer at enron scale) never
        # sit materialized while another layer's backward runs — under
        # the window-level full remat alone, layer 1's replayed residuals
        # wait through layer 2's entire backward, and the enron window
        # dies at runtime with RESOURCE_EXHAUSTED (r5 bisection
        # scripts/diag_enron.py: fwd/loss/grad/one-epoch all pass, the
        # epoch chunk OOMs).  Costs one extra per-layer forward in
        # backward; read at trace time.
        if os.environ.get("CTGCN_TPU_LAYER_REMAT") == "1":
            for layer in self.layers:
                x = jax.checkpoint(
                    lambda lyr, xx: lyr(xx, pyramid))(layer, x)
            return x
        for layer in self.layers:
            x = layer(x, pyramid)
        return x


@struct.dataclass
class CGCN:
    """Static k-core GCN (reference models.py:129-187).

    'C' variant: MLP(in→hid) feature transform then CDN(hid→out).
    'S' variant: MLP(in→out); the transform output is also returned as the
    structure embedding for the reconstruction loss.
    One parameter set shared across snapshots; the multi-snapshot call vmaps
    over time.
    """

    mlp: MLP
    cdn: CDN
    model_type: str = struct.field(pytree_node=False)

    method_name = property(lambda self: "CGCN-" + self.model_type)

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, trans_num, diffusion_num,
             bias=True, rnn_type="GRU", model_type="C",
             trans_activate_type="L"):
        assert model_type in ("C", "S")
        k1, k2 = jax.random.split(key)
        if model_type == "C":
            mlp = MLP.init(k1, input_dim, hidden_dim, hidden_dim, trans_num,
                           bias=bias, activate_type=trans_activate_type)
            cdn = CDN.init(k2, hidden_dim, output_dim, output_dim,
                           diffusion_num, bias=bias, rnn_type=rnn_type)
        else:
            mlp = MLP.init(k1, input_dim, hidden_dim, output_dim, trans_num,
                           bias=bias, activate_type=trans_activate_type)
            cdn = CDN.init(k2, output_dim, output_dim, output_dim,
                           diffusion_num, bias=bias, rnn_type=rnn_type)
        return CGCN(mlp=mlp, cdn=cdn, model_type=model_type)

    def single(self, x, pyramid):
        trans = _mlp_maybe_identity(self.mlp, x)
        emb = self.cdn(trans, pyramid)
        if self.model_type == "S":
            return emb, trans
        return emb

    def __call__(self, xs, pyramids):
        """xs: [T, N, in] or None (identity); pyramids: stacked [T, ...].

        The Pallas-plan path runs the snapshots through ``lax.map`` (a
        hand-DMA'd pallas_call has no vmap batching rule; one big kernel per
        snapshot serializes cleanly).  Windows whose activation footprint
        exceeds the activation budget also serialize, with ``jax.checkpoint``
        so the backward holds one snapshot's internals at a time.  The
        blocks backend unrolls over t when the bank is ragged (exact
        per-snapshot shapes — the single-device fast path) and vmaps like
        the others when stack_pyramids padded it to window-uniform shapes
        (the mesh path)."""
        if pyramids.blocks is not None and isinstance(pyramids.blocks[0],
                                                      tuple):
            from ctgcn_tpu.ops.pyramid import pyramid_at

            if _batch_window_tail():
                # SpMMs unroll over t, the parametrized tail batches
                # across t (see _ragged_blocks_cdn_window)
                T = len(pyramids.blocks)
                trans = jnp.stack([
                    _mlp_maybe_identity(self.mlp,
                                        None if xs is None else xs[t])
                    for t in range(T)])
                embs = _ragged_blocks_cdn_window(self.cdn, trans, pyramids,
                                                 stacked_params=False)
                if self.model_type == "S":
                    return embs, trans
                return embs
            # ragged per-snapshot block shapes: unroll over t (T <= ~15)
            res = [self.single(None if xs is None else xs[t],
                               pyramid_at(pyramids, t))
                   for t in range(len(pyramids.blocks))]
            return jax.tree.map(lambda *a: jnp.stack(a), *res)
        use_map = pyramids.plan_fwd is not None
        remat = _window_act_bytes(self.cdn, pyramids) > _act_budget_bytes()
        use_map |= remat
        if xs is None:
            fn = lambda pyr: self.single(None, pyr)
            if remat:
                fn = _remat(fn)
            res = jax.lax.map(fn, pyramids) if use_map else jax.vmap(fn)(pyramids)
        elif use_map:
            fn = lambda x, pyr: self.single(x, pyr)
            if remat:
                fn = _remat(fn)
            res = jax.lax.map(lambda a: fn(*a), (xs, pyramids))
        else:
            res = jax.vmap(self.single)(xs, pyramids)
        return res  # [T, N, out] or (embs, trans) for 'S'


@struct.dataclass
class CTGCN:
    """Temporal k-core GCN (reference models.py:191-253).

    Per-timestep distinct MLP+CDN stacks (parameters stacked on a leading
    time axis), a single RNN over the time axis, then LayerNorm.
    """

    mlps: MLP   # leaves carry a leading [T] axis
    cdns: CDN   # leaves carry a leading [T] axis
    rnn: GRUCell | LSTMCell
    norm: LayerNorm
    duration: int = struct.field(pytree_node=False)
    model_type: str = struct.field(pytree_node=False)

    method_name = property(lambda self: "CTGCN-" + self.model_type)

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, trans_num, diffusion_num,
             duration, bias=True, rnn_type="GRU", model_type="C",
             trans_activate_type="L"):
        assert model_type in ("C", "S")
        keys = jax.random.split(key, duration + 1)
        per_t = [
            CGCN.init(keys[t], input_dim, hidden_dim, output_dim, trans_num,
                      diffusion_num, bias=bias, rnn_type=rnn_type,
                      model_type=model_type,
                      trans_activate_type=trans_activate_type)
            for t in range(duration)
        ]
        mlps = jax.tree.map(lambda *xs: jnp.stack(xs), *[m.mlp for m in per_t])
        cdns = jax.tree.map(lambda *xs: jnp.stack(xs), *[m.cdn for m in per_t])
        rnn = _make_rnn(keys[duration], rnn_type, output_dim, output_dim,
                        bias=bias)
        return CTGCN(mlps=mlps, cdns=cdns, rnn=rnn,
                     norm=LayerNorm.init(output_dim), duration=duration,
                     model_type=model_type)

    def per_timestep(self, xs, pyramids):
        """The embarrassingly-parallel half of the forward: per-timestep
        MLP+CDN stacks over the window.  Returns (hx [T, N, out],
        trans [T, N, d]).  Factored out so the temporal-pipeline path
        (parallel/pipeline.ctgcn_pipelined_forward) can reuse it and swap
        only the sequential time RNN."""
        def per_t(mlp, cdn, x, pyr):
            trans = _mlp_maybe_identity(mlp, x)
            emb = cdn(trans, pyr)
            return emb, trans

        if pyramids.blocks is not None and isinstance(pyramids.blocks[0],
                                                      tuple):
            from ctgcn_tpu.ops.pyramid import pyramid_at

            T = len(pyramids.blocks)
            if _batch_window_tail():
                # SpMMs unroll over t, the per-timestep-parametrized tail
                # batches across t (see _ragged_blocks_cdn_window)
                trans = jnp.stack([
                    _mlp_maybe_identity(
                        jax.tree.map(lambda l: l[t], self.mlps),
                        None if xs is None else xs[t])
                    for t in range(T)])
                hx = _ragged_blocks_cdn_window(self.cdns, trans, pyramids,
                                               stacked_params=True)
                return hx, trans
            # ragged per-snapshot block shapes: unroll over t (T <= ~15)
            res = []
            for t in range(T):
                mlp_t = jax.tree.map(lambda l: l[t], self.mlps)
                cdn_t = jax.tree.map(lambda l: l[t], self.cdns)
                res.append(per_t(mlp_t, cdn_t,
                                 None if xs is None else xs[t],
                                 pyramid_at(pyramids, t)))
            return jax.tree.map(lambda *a: jnp.stack(a), *res)
        use_map = pyramids.plan_fwd is not None
        remat = _window_act_bytes(self.cdns, pyramids) > _act_budget_bytes()
        use_map |= remat
        if remat:
            per_t = _remat(per_t)
        if xs is None:
            fn = lambda mlp, cdn, pyr: per_t(mlp, cdn, None, pyr)
            if use_map:
                hx, trans = jax.lax.map(lambda a: fn(*a),
                                        (self.mlps, self.cdns, pyramids))
            else:
                hx, trans = jax.vmap(fn)(self.mlps, self.cdns, pyramids)
        elif use_map:
            hx, trans = jax.lax.map(lambda a: per_t(*a),
                                    (self.mlps, self.cdns, xs, pyramids))
        else:
            hx, trans = jax.vmap(per_t)(self.mlps, self.cdns, xs, pyramids)
        return hx, trans

    def __call__(self, xs, pyramids):
        """xs: [T, N, in] or None; pyramids: stacked [T, K, P] leaves.

        Returns [T, N, out] embeddings ('C'), or (embeddings, trans [T, N, d])
        for the 'S' variant.
        """
        hx, trans = self.per_timestep(xs, pyramids)
        # hx: [T, N, out] — time-axis RNN (batch = nodes), then LayerNorm
        outs, _ = rnn_scan(self.rnn, hx)
        out = self.norm(outs)
        if self.model_type == "C":
            return out
        return out, trans
