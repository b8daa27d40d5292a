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

from nlshray.state.unionfind import UnionFind


def _stream_edges(ds: ray.data.Dataset, left: str, right: str):
    for b in ds.select_columns([left, right]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        yield np.asarray(b[left]), np.asarray(b[right])


def cluster_stage(
    confirmed_pairs: ray.data.Dataset,
    exact_map_ds: ray.data.Dataset,
    cfg,
    *,
    exact_edges: tuple | None = None,
) -> ray.data.Dataset:
    """-> clusters (doc_id, cluster_id) for EVERY doc, singletons included.

    ``exact_edges``: optional pre-collected (doc_ids, rep_ids) numpy
    arrays — the pipeline fuses their gathering with the verify scan.
    """
    uf = UnionFind()
    for lefts, rights in _stream_edges(confirmed_pairs, "left_id", "right_id"):
        for a, b in zip(lefts.tolist(), rights.tolist()):
            uf.union(a, b)
    # exact-dup edges: doc -> representative
    if exact_edges is not None:
        for a, b in zip(exact_edges[0].tolist(), exact_edges[1].tolist()):
            uf.union(a, b)
    else:
        for docs, reps in _stream_edges(exact_map_ds, "doc_id", "rep_id"):
            mask = docs != reps
            for a, b in zip(docs[mask].tolist(), reps[mask].tolist()):
                uf.union(a, b)

    seen = list(uf.parent.keys())
    label_map = dict(zip(seen, uf.labels(seen)))
    map_ref = ray.put(label_map)

    def assign(t: pa.Table) -> pa.Table:
        labels = ray.get(map_ref)
        d = t["doc_id"].to_numpy()
        out = np.fromiter(
            (labels.get(int(x), int(x)) for x in d), dtype=np.int64, count=len(d)
        )
        return pa.table({"doc_id": t["doc_id"], "cluster_id": pa.array(out)})

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
