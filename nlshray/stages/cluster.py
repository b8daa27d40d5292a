"""Connected components -> cluster assignment (SURVEY.md §7.1 step 7).

Confirmed near-dup pairs plus exact-dup (doc -> rep) edges define the
duplicate graph; a component's label is its minimum doc_id (canonical,
permutation-invariant). Two interchangeable engines:

* **driver union-find** (default): confirmed pairs are a tiny fraction
  of the corpus, streamed to the driver via ``iter_batches`` — never
  ``take_all`` on the wide tables. Labels for the (small) set of
  non-singleton docs are broadcast back and the final clusters table is
  built distributedly by ``map_batches`` over the exact-dup map.
* **distributed star components** (``star_components``): for pair sets
  beyond ``cfg.max_driver_pairs``; alternating large-star / small-star
  raw-task exchanges (Kiveris et al. 2014) converging in O(log n)
  rounds. Produces identical labels. ``label_propagation`` (iterated
  groupby-Min, O(diameter) rounds — literature anchor: BTS, ICDE 2024,
  see PAPERS.md) is kept as the reference engine the star rounds are
  tested against.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min



def _stream_edges(ds: ray.data.Dataset, left: str, right: str):
    for b in ds.select_columns([left, right]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        yield np.asarray(b[left]), np.asarray(b[right])


def numpy_components(
    lefts: np.ndarray, rights: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Min-label connected components of an edge list, fully vectorized.

    Returns ``(sorted_node_ids, labels)`` — label = min member id of the
    node's component (identical to ``UnionFind.labels`` by construction).
    Iterated ``np.minimum.at`` over edge endpoints + pointer jumping;
    converges in O(log diameter)-ish rounds (near-dup components are
    shallow — exact dups are pre-collapsed).
    """
    nodes = np.unique(np.concatenate([lefts, rights]))
    li = np.searchsorted(nodes, lefts).astype(np.int64)
    ri = np.searchsorted(nodes, rights).astype(np.int64)
    lab = np.arange(nodes.shape[0], dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, li, lab[ri])
        np.minimum.at(new, ri, lab[li])
        new = np.minimum(new, new[new])  # pointer jumping
        if np.array_equal(new, lab):
            break
        lab = new
    return nodes, nodes[lab]


def cluster_stage(
    confirmed_pairs: ray.data.Dataset,
    exact_map_ds: ray.data.Dataset,
    cfg,
    *,
    exact_edges: tuple | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """-> clusters (doc_id, cluster_id) for EVERY doc, singletons included.

    ``exact_edges``: optional pre-collected (doc_ids, rep_ids) numpy
    arrays — the pipeline fuses their gathering with the verify scan.

    Engine dispatch: confirmed-pair counts up to ``cfg.max_driver_pairs``
    run vectorized driver-side components (``numpy_components``; pairs
    are a tiny fraction of the corpus); beyond it — the 10^12-doc
    regime, where the pair table can exceed driver memory — the
    distributed large-star/small-star engine takes over (identical
    labels; tested equal).
    """
    max_driver = getattr(cfg, "max_driver_pairs", 5_000_000)
    if confirmed_pairs.count() > max_driver:
        def nondiag(t: pa.Table) -> pa.Table:
            keep = pa.compute.not_equal(t["doc_id"], t["rep_id"])
            t = t.filter(keep)
            return pa.table(
                {"left_id": t["doc_id"], "right_id": t["rep_id"]}
            )

        edges = confirmed_pairs.select_columns(["left_id", "right_id"]).union(
            exact_map_ds.map_batches(
                nondiag, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        nodes = exact_map_ds.select_columns(["doc_id"])
        return star_components(
            edges, nodes, num_partitions=num_partitions
        )

    # ----- driver path: gather the (small) edge set, solve vectorized -----
    lefts_c, rights_c = [], []
    for lefts, rights in _stream_edges(confirmed_pairs, "left_id", "right_id"):
        lefts_c.append(lefts)
        rights_c.append(rights)
    if exact_edges is not None:
        mask = exact_edges[0] != exact_edges[1]
        lefts_c.append(exact_edges[0][mask])
        rights_c.append(exact_edges[1][mask])
    else:
        # Filter the doc==rep diagonal DISTRIBUTEDLY before streaming:
        # the exact map is corpus-sized (one row per doc) but real
        # exact-dup edges are a few percent of it — streaming the whole
        # map through the driver was the cluster stage's serial
        # non-scaling term at campaign scale (12.8M rows ≈ 200 MB
        # single-threaded per run; r4 campaign K showed cluster scaling
        # only 1.4x on 4x cores).
        def _dup_edges(t: pa.Table) -> pa.Table:
            keep = pa.compute.not_equal(t["doc_id"], t["rep_id"])
            return t.filter(keep)

        filtered = exact_map_ds.select_columns(
            ["doc_id", "rep_id"]
        ).map_batches(
            _dup_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        for docs, reps in _stream_edges(filtered, "doc_id", "rep_id"):
            lefts_c.append(docs)
            rights_c.append(reps)
    l = np.concatenate(lefts_c) if lefts_c else np.empty(0, np.int64)
    r = np.concatenate(rights_c) if rights_c else np.empty(0, np.int64)
    keys, labels = numpy_components(l, r)
    map_ref = ray.put((keys, labels))

    def assign(t: pa.Table) -> pa.Table:
        from nlshray.functions.nputil import lookup_sorted

        ks, vs = ray.get(map_ref)
        d = t["doc_id"].to_numpy()
        out = lookup_sorted(ks, vs, d, d)
        return pa.table(
            {"doc_id": t["doc_id"], "cluster_id": pa.array(out)}
        )

    return exact_map_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def label_propagation(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    num_partitions: int = 32,
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Distributed connected components by iterated min-label groupby.

    ``edges``: (left_id, right_id); ``nodes``: (doc_id). Each round every
    node adopts the min label in its closed neighborhood; converges in
    O(graph diameter) rounds (near-dup components are shallow — exact
    dups are pre-collapsed, so diameters are small). Shuffle key:
    ``doc_id`` per round (SURVEY.md §7.3).
    """
    # labels: (doc_id, label), initialised to self
    labels = nodes.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "label": t["doc_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [t["left_id"].combine_chunks(), t["right_id"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t["right_id"].combine_chunks(), t["left_id"].combine_chunks()]
                ),
            }
        )

    sym_edges = edges.select_columns(["left_id", "right_id"]).map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(max_rounds):
        # propose: each edge endpoint receives its neighbor's label
        nbr_labels = sym_edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["nbr", "nbr_label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("nbr",),
        ).select_columns(["doc_id", "nbr_label"])
        candidates = nbr_labels.union(
            labels.map_batches(
                lambda t: t.rename_columns(["doc_id", "nbr_label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        new_labels = (
            candidates.groupby("doc_id", num_partitions=num_partitions)
            .aggregate(Min("nbr_label", alias_name="label"))
            .materialize()
        )
        # convergence: did any label change?
        joined = new_labels.join(
            labels.map_batches(
                lambda t: t.rename_columns(["doc_id", "old_label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("doc_id",),
        )
        changed = joined.map_batches(
            lambda t: t.filter(
                pa.compute.not_equal(t["label"], t["old_label"])
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).count()
        labels = new_labels
        if changed == 0:
            break

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# large-star / small-star connected components (alternating algorithm,
# Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
# ---------------------------------------------------------------------------
# The O(log n)-round engine for the beyond-driver-memory pair regime:
# min-label propagation needs O(graph diameter) join+groupby rounds
# (bad on chain-shaped dup graphs), while the alternating star rounds
# flatten components geometrically. Each half-round is ONE raw-task
# exchange (the stages/exchange.py plan shape): a shard pass keyed by
# endpoint, then a vectorized per-partition reduce — no Dataset.join,
# no per-group Python. At the fixed point every component is a star
# whose root is the component minimum, so labels read directly off the
# converged edge list.


def _dedup_pairs(l: np.ndarray, r: np.ndarray):
    """(l, r) pairs sorted by (l, r) with exact duplicates removed."""
    if l.shape[0] == 0:
        return l, r
    order = np.lexsort((r, l))
    l, r = l[order], r[order]
    keep = np.concatenate([[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
    return l[keep], r[keep]


def _pair_stat(l: np.ndarray, r: np.ndarray):
    """Order-free (count, hash-sum) fingerprint of a deduped pair set —
    the cross-round convergence signal (two equal fingerprints mean the
    edge set stopped changing, w.h.p. of the 64-bit hash)."""
    from nlshray.hashing import splitmix64

    if l.shape[0] == 0:
        return 0, 0
    h = splitmix64(
        l.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ r.astype(np.uint64)
    )
    return int(l.shape[0]), int(h.sum(dtype=np.uint64))


def _split_pairs(u: np.ndarray, v: np.ndarray, P: int):
    part = u % P
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    out = [
        (u[order[bounds[p] : bounds[p + 1]]], v[order[bounds[p] : bounds[p + 1]]])
        for p in range(P)
    ]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _pairs_of_block(t: pa.Table, left: str, right: str):
    lc, rc = t[left], t[right]
    if isinstance(lc, pa.ChunkedArray):
        lc = lc.combine_chunks()
    if isinstance(rc, pa.ChunkedArray):
        rc = rc.combine_chunks()
    return lc.to_numpy(), rc.to_numpy()


@ray.remote
def _star_shard_sym(pair, P: int):
    """Large-star map: symmetrize so each node's FULL neighborhood
    lands in its ``node % P`` shard."""
    l, r = pair
    keep = l != r
    l, r = l[keep], r[keep]
    u = np.concatenate([l, r])
    v = np.concatenate([r, l])
    return _split_pairs(u, v, P)


@ray.remote
def _star_shard_max(pair, P: int):
    """Small-star map: key every edge by its LARGER endpoint (so a
    reduce node sees exactly its smaller neighbors)."""
    l, r = pair
    u = np.maximum(l, r)
    v = np.minimum(l, r)
    keep = u != v
    return _split_pairs(u[keep], v[keep], P)


@ray.remote(num_returns=2)
def _large_star_reduce(*shards):
    """Per node u: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u),
    v > u. Neighbor sets are exact (shard-local dedup). Second return
    is this partition's input fingerprint for convergence."""
    e = np.empty(0, np.int64)
    u = np.concatenate([s[0] for s in shards]) if shards else e
    v = np.concatenate([s[1] for s in shards]) if shards else e
    if u.shape[0] == 0:
        return (e, e), (0, 0)
    u, v = _dedup_pairs(u, v)
    stat = _pair_stat(u, v)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(u)) + 1])
    counts = np.diff(np.concatenate([starts, [u.shape[0]]]))
    # sorted by (u, v): v[starts] is min neighbor of each u
    m = np.minimum(v[starts], u[starts])
    segm = np.repeat(m, counts)
    mask = v > u
    return _dedup_pairs(v[mask], segm[mask]), stat


@ray.remote(num_returns=2)
def _small_star_reduce(*shards):
    """Per node u (neighbors all < u here): m = min(N); emit (v, m)
    for v ∈ N \\ {m} plus (u, m)."""
    e = np.empty(0, np.int64)
    u = np.concatenate([s[0] for s in shards]) if shards else e
    v = np.concatenate([s[1] for s in shards]) if shards else e
    if u.shape[0] == 0:
        return (e, e), (0, 0)
    u, v = _dedup_pairs(u, v)
    stat = _pair_stat(u, v)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(u)) + 1])
    counts = np.diff(np.concatenate([starts, [u.shape[0]]]))
    m = v[starts]  # min of N(u); all neighbors < u so min(N ∪ {u}) = m
    segm = np.repeat(m, counts)
    mask = v != segm
    out_l = np.concatenate([v[mask], u[starts]])
    out_r = np.concatenate([segm[mask], m])
    return _dedup_pairs(out_l, out_r), stat


@ray.remote
def _node_ids_of_block(t: pa.Table, col: str, P: int):
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    ids = c.to_numpy()
    part = ids % P
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    out = [ids[order[bounds[p] : bounds[p + 1]]] for p in range(P)]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _star_label_shard(pair, P: int):
    """Shard converged (child, root) edges by child % P."""
    return _split_pairs(pair[0], pair[1], P)


@ray.remote
def _star_label_merge(n_node_shards: int, *shards) -> pa.Table:
    # refs nested inside list arguments are NOT auto-resolved by Ray —
    # everything arrives flat as varargs with a split count
    from nlshray.functions.nputil import lookup_sorted

    node_shards = shards[:n_node_shards]
    edge_shards = shards[n_node_shards:]
    e = np.empty(0, np.int64)
    ids = np.concatenate(node_shards) if node_shards else e
    cl = np.concatenate([s[0] for s in edge_shards]) if edge_shards else e
    cr = np.concatenate([s[1] for s in edge_shards]) if edge_shards else e
    cl, cr = _dedup_pairs(cl, cr)
    if cl.shape[0]:
        first = np.concatenate([[True], cl[1:] != cl[:-1]])
        cl, cr = cl[first], cr[first]
    lab = lookup_sorted(cl, cr, ids, ids) if ids.shape[0] else ids
    return pa.table(
        {"doc_id": pa.array(ids), "cluster_id": pa.array(lab)}
    )


def star_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    num_partitions: int = 32,
    max_rounds: int = 50,
    left: str = "left_id",
    right: str = "right_id",
    node_col: str = "doc_id",
) -> ray.data.Dataset:
    """Distributed connected components; same contract and labels as
    ``label_propagation`` (label = component-min doc_id), O(log n)
    rounds instead of O(diameter).

    Partitioning assumption: one shard's edges fit one worker (same as
    every exchange here); edge volume is non-increasing round over
    round, and per-round traffic is the edge list itself — never the
    corpus.
    """
    P = max(1, num_partitions)
    blocks = [
        _pairs_of_block.remote(r, left, right)
        for r in edges.select_columns([left, right]).to_arrow_refs()
    ]
    prev_stat = None
    for _ in range(max_rounds):
        # large-star half-round
        sh = [_star_shard_sym.options(num_returns=P).remote(b, P) for b in blocks]
        if P == 1:
            sh = [[s] for s in sh]
        ls_out = [
            _large_star_reduce.remote(*[s[p] for s in sh]) for p in range(P)
        ]
        ls_pairs = [o[0] for o in ls_out]
        stats = ray.get([o[1] for o in ls_out])
        stat = (
            sum(s[0] for s in stats),
            sum(s[1] for s in stats) % (1 << 64),
        )
        if prev_stat is not None and stat == prev_stat:
            break
        prev_stat = stat
        # small-star half-round
        sh2 = [
            _star_shard_max.options(num_returns=P).remote(b, P)
            for b in ls_pairs
        ]
        if P == 1:
            sh2 = [[s] for s in sh2]
        ss_out = [
            _small_star_reduce.remote(*[s[p] for s in sh2]) for p in range(P)
        ]
        blocks = [o[0] for o in ss_out]

    # labels off the converged star forest: child -> root, default self
    node_sh = [
        _node_ids_of_block.options(num_returns=P).remote(r, node_col, P)
        for r in nodes.select_columns([node_col]).to_arrow_refs()
    ]
    edge_sh = [
        _star_label_shard.options(num_returns=P).remote(b, P) for b in blocks
    ]
    if P == 1:
        node_sh = [[s] for s in node_sh]
        edge_sh = [[s] for s in edge_sh]
    parts = [
        _star_label_merge.remote(
            len(node_sh), *[n[p] for n in node_sh], *[e[p] for e in edge_sh]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(parts)
