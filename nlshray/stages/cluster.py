"""Connected components -> cluster assignment (SURVEY.md §7.1 step 7).

Confirmed near-dup pairs plus exact-dup (doc -> rep) edges define the
duplicate graph; a component's label is its minimum doc_id (canonical,
permutation-invariant). Two interchangeable engines:

* **driver union-find** (default): confirmed pairs are a tiny fraction
  of the corpus, streamed to the driver via ``iter_batches`` — never
  ``take_all`` on the wide tables. Labels for the (small) set of
  non-singleton docs are broadcast back and the final clusters table is
  built distributedly by ``map_batches`` over the exact-dup map.
* **distributed min-label propagation** (``label_propagation``): for
  pair sets beyond ``cfg.max_driver_pairs``; iterated groupby-Min rounds
  (literature anchor: BTS, ICDE 2024 — see PAPERS.md). Produces
  identical labels.
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
    regime, where the pair table can exceed driver memory — distributed
    min-label propagation takes over (identical labels; tested equal).
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
        return label_propagation(
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
