# coding: utf-8
"""Generate in-tree stand-ins for the reference's remaining published
regimes — Math, Facebook, Enron (reference README.md:172-174):

  math      24,740 nodes /   323,357 edges / max deg  231 / max core 15 / 77 snapshots
  facebook  60,730 nodes /   607,487 edges / max deg  203 / max core  9 / 27 snapshots
  enron     87,036 nodes /   530,284 edges / max deg 1150 / max core 22 / 38 snapshots

The reference ships only UCI; like `gen_as.py` (and the reference's own
synthetic-dynamics recipe, graph.py:101-108) these synthesize
statistically matched stand-ins in the reference layout, so the full
pipeline can run at every published regime.

Model (calibrated empirically — ER mean-degree c maps to max core as
measured in-repo: n=300 c=22 -> 15, n=1500 c=13 -> 9, n=400 c=32.5 -> 22):

  * a persistent ACTIVE COMMUNITY of ``n_c`` nodes holding an ER edge set
    of mean degree ``c`` — this plants the snapshot's max k-core;
  * one HUB node with a uniform star sized to the published max degree
    (email/wall-post "celebrity" traffic; star edges peel away in k-core
    decomposition so they do not disturb the planted core);
  * a POWER-LAW BACKGROUND over all N nodes absorbing the remaining
    per-snapshot budget (mean degree << 1: contributes no core);
  * 10% community churn + fresh background per snapshot (slices, not
    cumulative — the UCI/AS convention; per-snapshot counts sum exactly
    to the published total).

Run: python scripts/gen_regimes.py [math facebook enron]  (CPU, ~2 min).
Deterministic (seeded).  Prints measured stats vs the reference row.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")

REGIMES = {
    # name: (N, E_total, T, n_c, c, hub_star, bg_power, ref_row, dyn)
    # dyn "v1": static community membership, 10% edge churn, fresh
    #   per-snapshot background (near-saturates link-pred: Had AUC 0.997
    #   at math scale — every member pair separates from uniform
    #   negatives, r4 finding).
    # dyn "v2" (math): the quality row must be able to FAIL — 30% edge
    #   churn + 7%/snapshot rolling community MEMBERSHIP (new members'
    #   t-1 embeddings look like background, so ~13% of community edges
    #   become genuinely hard), background drawn from a HIDDEN persistent
    #   activity ranking (permuted power law) with 50% edge persistence —
    #   temporal methods that track drift/recurrence keep an edge over
    #   static ones, instead of everything reading the same near-ceiling.
    "math": (24_740, 323_357, 77, 300, 20.8, 225,
             0.70, "24740 / 323,357 / 231 / 15 / 77", "v2"),
    "facebook": (60_730, 607_487, 27, 1500, 12.3, 197,
                 0.30, "60730 / 607,487 / 203 / 9 / 27", "v1"),
    "enron": (87_036, 530_284, 38, 400, 32.5, 1146,
              0.30, "87036 / 530,284 / 1150 / 22 / 38", "v1"),
}
CHURN = 0.10          # v1 community edge churn
V2_EDGE_CHURN = 0.30  # v2: community edge resample fraction / snapshot
V2_MEMBER_CHURN = 0.07  # v2: community membership replacement / snapshot
V2_BG_PERSIST = 0.50  # v2: background edges surviving to the next snapshot


def er_edges(rng, n, e, have=None):
    """``e`` unique undirected ER edge codes over [0, n), excluding
    ``have``."""
    out = have if have is not None else np.empty(0, np.int64)
    start = out.size
    while out.size < start + e:
        m = max(2 * (start + e - out.size), 4096)
        u = rng.randint(0, n, size=m)
        v = rng.randint(0, n, size=m)
        k = u != v
        code = (np.minimum(u[k], v[k]).astype(np.int64) * n
                + np.maximum(u[k], v[k]))
        code = np.unique(code)
        code = code[~np.isin(code, out)]
        out = np.concatenate([out, code[:start + e - out.size]])
    return out


def background_edges(rng, n, e, power, exclude, p=None):
    """Power-law background over all nodes, excluding existing codes.
    ``p`` overrides the rank-indexed weights (v2's hidden permuted
    activity distribution)."""
    if p is None:
        w = np.arange(1, n + 1, dtype=np.float64) ** (-power)
        p = w / w.sum()
    out = np.empty(0, np.int64)
    have = exclude
    while out.size < e:
        m = max(2 * (e - out.size), 8192)
        u = rng.choice(n, size=m, p=p)
        v = rng.choice(n, size=m, p=p)
        k = u != v
        code = (np.minimum(u[k], v[k]).astype(np.int64) * n
                + np.maximum(u[k], v[k]))
        code = np.unique(code)
        code = code[~np.isin(code, have)]
        take = code[:e - out.size]
        out = np.concatenate([out, take])
        have = np.concatenate([have, take])
    return out


def snapshot_stats(n, codes):
    import scipy.sparse as sp

    from ctgcn_tpu.preprocessing.kcore import core_numbers

    u, v = codes // n, codes % n
    deg = np.bincount(np.concatenate([u, v]), minlength=n)
    a = sp.coo_matrix((np.ones(codes.size), (u, v)), shape=(n, n))
    a = (a + a.T).tocsr()
    return int(deg.max()), int(core_numbers(a).max())


def _gen_v2_window_edges(rng, N, n_c, e_c, hub, p_act, state):
    """One snapshot's community codes under v2 dynamics (rolling
    membership + edge churn).  ``state``: (members [n_c] node ids,
    comm_idx codes over member SLOTS) mutated across snapshots."""
    members, comm_idx = state
    if comm_idx is None:                       # first snapshot
        comm_idx = er_edges(rng, n_c, e_c)
    else:
        n_rep = int(V2_MEMBER_CHURN * n_c)
        rep_slots = rng.choice(n_c, size=n_rep, replace=False)
        outside = np.setdiff1d(np.arange(N), np.append(members, hub),
                               assume_unique=False)
        members[rep_slots] = rng.choice(outside, size=n_rep, replace=False)
        u, v = comm_idx // n_c, comm_idx % n_c
        touch = np.isin(u, rep_slots) | np.isin(v, rep_slots)
        keep = comm_idx[~touch]
        drop = rng.choice(keep.size, size=int(V2_EDGE_CHURN * keep.size),
                          replace=False)
        keep = np.delete(keep, drop)
        comm_idx = er_edges(rng, n_c, e_c - keep.size, have=keep)
    state[1] = comm_idx
    u, v = members[comm_idx // n_c], members[comm_idx % n_c]
    return (np.minimum(u, v).astype(np.int64) * N + np.maximum(u, v))


def gen(name):
    N, E_total, T, n_c, c, hub_star, bg_power, ref, dyn = REGIMES[name]
    rng = np.random.RandomState(20260819)
    base = os.path.join(DATA, name)
    fmt_dir = os.path.join(base, "1.format")
    node_dir = os.path.join(base, "nodes_set")
    os.makedirs(fmt_dir, exist_ok=True)
    os.makedirs(node_dir, exist_ok=True)

    names = np.array([f"U{i:05d}" for i in range(N)])
    with open(os.path.join(node_dir, "nodes.csv"), "w") as fp:
        fp.write("\n".join(names) + "\n")

    counts = np.full(T, E_total // T, np.int64)
    counts[:E_total - counts.sum()] += 1
    assert counts.sum() == E_total

    # community occupies [0, n_c); the hub is node n_c (outside it, so
    # star edges peel and never deepen the planted core)
    e_c = int(round(c * n_c / 2))
    hub = n_c
    if dyn == "v2":
        # hidden persistent activity: a power law over a SECRET node
        # permutation (so node id carries no signal), fixed across time
        w = np.empty(N, np.float64)
        w[rng.permutation(N)] = (
            np.arange(1, N + 1, dtype=np.float64) ** (-bg_power))
        p_act = w / w.sum()
        v2_state = [rng.choice(np.delete(np.arange(N), hub), size=n_c,
                               replace=False), None]
        bg_prev = np.empty(0, np.int64)
    else:
        comm = er_edges(rng, n_c, e_c)
    max_deg_seen, max_core_seen = 0, 0
    for t in range(T):
        if dyn == "v2":
            comm_codes = _gen_v2_window_edges(rng, N, n_c, e_c, hub,
                                              p_act, v2_state)
        elif t > 0:
            drop = rng.choice(comm.size, size=int(CHURN * comm.size),
                              replace=False)
            comm = er_edges(rng, n_c, drop.size,
                            have=np.delete(comm, drop))
        star_v = rng.choice(N - n_c - 1, size=hub_star,
                            replace=False) + n_c + 1
        star = np.minimum(hub, star_v).astype(np.int64) * N \
            + np.maximum(hub, star_v)
        if dyn != "v2":
            # community codes over [0, n_c) are valid over N unchanged
            # since min/max node ids stay < n_c < N
            comm_codes = (comm // n_c) * N + (comm % n_c)
        used = np.concatenate([comm_codes, star])
        if dyn == "v2":
            # 50% of the previous background survives (recurrence a
            # temporal method can exploit); the rest redraws from the
            # hidden activity distribution
            keep_n = int(V2_BG_PERSIST * bg_prev.size)
            bg_keep = (rng.choice(bg_prev, size=keep_n, replace=False)
                       if keep_n else np.empty(0, np.int64))
            bg_keep = bg_keep[~np.isin(bg_keep, used)]
            used2 = np.concatenate([used, bg_keep])
            fresh = background_edges(
                rng, N, int(counts[t]) - used2.size, bg_power, used2,
                p=p_act)
            bg = np.concatenate([bg_keep, fresh])
            bg_prev = bg
        else:
            bg = background_edges(rng, N, int(counts[t]) - used.size,
                                  bg_power, used)
        codes = np.concatenate([used, bg])
        assert codes.size == counts[t]
        d, k = snapshot_stats(N, codes)
        max_deg_seen = max(max_deg_seen, d)
        max_core_seen = max(max_core_seen, k)
        u, v = codes // N, codes % N
        order = rng.permutation(codes.size)
        with open(os.path.join(fmt_dir, f"{t:03d}.csv"), "w") as fp:
            fp.write("from_id\tto_id\tweight\n")
            fp.writelines(f"{names[u[i]]}\t{names[v[i]]}\t1\n"
                          for i in order)
        if t % 10 == 0:
            print(f"  snapshot {t}: E={counts[t]}, deg={d}, core={k}",
                  flush=True)

    print(f"{name}: N={N}, total_edges={E_total}, "
          f"max_degree={max_deg_seen}, max_core={max_core_seen}, "
          f"snapshots={T}")
    print(f"  reference: {ref}")


if __name__ == "__main__":
    targets = sys.argv[1:] or list(REGIMES)
    for t in targets:
        gen(t)
