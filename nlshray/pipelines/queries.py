"""Driver-contract queries: one entry per implemented operator family.

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a Ray Dataset / Arrow table. Where an ANSI-SQL equivalent exists
it lives in ``ORACLE_SQL`` (same column names — the driver's comparator
hashes values after sorting columns by name).

Float columns in SQL-checked outputs are rounded (ROUND in SQL, np.round
here) so summation-order noise cannot flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from nlshray.config import DedupConfig
from nlshray.pipelines.dedup import dedup_docs, to_arrow
from nlshray.stages.ann import (
    embedding_near_dup,
    gather_matrix,
    knn_bruteforce,
    knn_hnsw,
    knn_ivf,
    knn_lsh,
    knn_pq,
)
from nlshray.stages.exact import exact_stage
from nlshray.stages.sign import sign_stage, sigs_to_numpy
from nlshray.stages.simhash import simhash_dedup
from nlshray.stages.textstats import textstats_stage

NPARTS = 8
CFG = DedupConfig()


def _gather_partials(ds: "rd.Dataset", expect_cols) -> pa.Table:
    """Driver-gather of per-block partial tables. Ray Data passes EMPTY
    input blocks through a map_batches unchanged (original schema), so
    a naive concat of ``to_arrow_refs`` can mix schemas — keep only
    blocks whose column-name set EXACTLY equals the partial schema.
    (A single marker column is not enough: when the marker also exists
    in the input schema — e.g. ``c_custkey`` both in and out — a
    passed-through empty input block survives a membership filter and
    the concat raises on the schema mismatch.)"""
    if isinstance(expect_cols, str):
        expect = {expect_cols}
    else:
        expect = set(expect_cols)
    tabs = [
        t
        for t in ray.get(ds.to_arrow_refs())
        if set(t.schema.names) == expect
    ]
    return pa.concat_tables(tabs) if tabs else None


def _pq(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    from nlshray.sources.pages import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


def _round_np(x: np.ndarray, nd: int) -> np.ndarray:
    """Bit-compatible with DuckDB ROUND: scale, rint, unscale. pyarrow's
    pc.round uses a different scheme and lands 1 ulp away on some values,
    which flips the driver's value hash even though the printed numbers
    agree."""
    p = 10.0**nd
    return np.round(x * p) / p


def _round(t: pa.Table, cols: dict[str, int]) -> pa.Table:
    for c, nd in cols.items():
        t = t.set_column(
            t.schema.get_field_index(c),
            c,
            pa.array(_round_np(t[c].to_numpy().astype(np.float64), nd)),
        )
    return t


# ---------------------------------------------------------------------------
# relational coverage (SURVEY.md A1-A6, T1, J1 physical patterns)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate over lineitem."""
    ds = _pq(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def add_disc(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return t.append_column("disc_price", disc)

    # Big SUMs of doubles are hash-unstable across engines: summation
    # order shifts the raw value by ~1e-4 at 5e9 magnitude over 600k
    # rows, comparable to any rounding step. AVG divides that error by N
    # (margin ~1e6 at 4dp), and sum_qty stays exact (integer-valued
    # doubles sum exactly in float64).
    out = (
        ds.map_batches(add_disc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=NPARTS)
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Mean("l_extendedprice", alias_name="avg_base_price"),
            Mean("disc_price", alias_name="avg_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )
    t = to_arrow(out)
    t = _round(
        t,
        {"sum_qty": 2, "avg_base_price": 4, "avg_disc_price": 4, "avg_qty": 6},
    )
    return t


def top_customers(sf_dir: str, *, strategy: str = "broadcast"):
    """Join orders x customer -> grouped revenue -> top 10.

    ``broadcast`` (default): the dimension table is ray.put once and
    merged per batch — no shuffle (ray_guide 'small side: broadcast it').
    ``shuffle``: ``Dataset.join`` hash-partitioned on the key — the path
    for two large sides.
    """
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"])
    if strategy == "shuffle":
        joined = orders.join(
            cust,
            join_type="inner",
            num_partitions=NPARTS,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
    else:
        cust_tbl = to_arrow(cust.materialize())
        keys = cust_tbl["c_custkey"].to_numpy()
        order = np.argsort(keys)
        cust_ref = ray.put(
            (keys[order], np.asarray(cust_tbl["c_name"].to_pylist(), dtype=object)[order])
        )

        def merge(t: pa.Table) -> pa.Table:
            k, names = ray.get(cust_ref)
            ck = t["o_custkey"].to_numpy()
            idx = np.searchsorted(k, ck)
            idx[idx == len(k)] = 0
            hit = k[idx] == ck
            out = t.filter(pa.array(hit))
            return out.append_column(
                "c_name", pa.array(names[idx[hit]].tolist(), pa.string())
            )

        joined = orders.map_batches(
            merge, batch_format="pyarrow", zero_copy_batch=True
        )
    agg = joined.groupby("c_name", num_partitions=NPARTS).aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"),
    )
    top = agg.sort("revenue", descending=True).limit(10)
    return _round(to_arrow(top), {"revenue": 2})


def q5_region_volume(sf_dir: str, *, region_name: str = "ASIA"):
    """TPC-H Q5 shape: five-table dimension-chain join -> revenue per
    nation for orders placed in 1995 by customers of one region, counting
    only line items supplied from the customer's own nation.

    Physical plan (the 100-TB shape):
      - region x nation (tiny dims) resolve on the driver to a
        nationkey -> name map for the target region.
      - customer / supplier (small dims) are projected to
        (key, nationkey), filtered to the region's nations, and broadcast
        once via ``ray.put`` as sorted arrays.
      - orders (fact) is read with only the 3 needed columns,
        date-filtered per batch, and mapped to (o_orderkey, c_nat) via
        the broadcast customer probe — a semi-join that shrinks the fact
        before the shuffle.
      - lineitem (fact) is projected to (l_orderkey, s_nat, revenue) the
        same way. The ONE big-big hash-shuffle join is orders x lineitem
        on the order key; everything else stayed broadcast.
      - the c_nat == s_nat filter and a per-block ``np.bincount`` partial
        sum by nation act as the combiner; the final groupby moves only
        (#blocks x #nations) tiny rows.
    """
    import pyarrow.parquet as papq

    # dims are small by definition: read them driver-side (one file, one
    # process) instead of paying four streaming-executor spin-ups
    nation = papq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = papq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rkeys = {
        rk
        for rk, rn in zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
        if rn == region_name
    }
    nat_name = {
        nk: nm
        for nk, nm, rg in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
        if rg in rkeys
    }
    nat_keys = np.array(sorted(nat_name), dtype=np.int64)
    names = [nat_name[k] for k in nat_keys]
    max_nat = int(nat_keys.max()) + 1 if len(nat_keys) else 1
    in_region = np.zeros(max_nat + 1, dtype=bool)
    in_region[nat_keys] = True

    def _dim_ref(table: str, key: str, nat: str):
        t = papq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, nat])
        k = t[key].to_numpy().astype(np.int64)
        n = t[nat].to_numpy().astype(np.int64)
        keep = (n <= max_nat) & in_region[np.minimum(n, max_nat)]
        k, n = k[keep], n[keep]
        order = np.argsort(k)
        return ray.put((k[order], n[order]))

    cust_ref = _dim_ref("customer", "c_custkey", "c_nationkey")
    supp_ref = _dim_ref("supplier", "s_suppkey", "s_nationkey")
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1996-01-01", "us")

    def _probe(ref, probe_keys: np.ndarray):
        k, n = ray.get(ref)
        idx = np.searchsorted(k, probe_keys)
        idx[idx == len(k)] = 0
        hit = (k[idx] == probe_keys) if len(k) else np.zeros(len(probe_keys), bool)
        return hit, n[idx[hit]] if len(k) else np.empty(0, np.int64)

    def orders_side(t: pa.Table):
        od = t["o_orderdate"].to_numpy()
        m = (od >= lo) & (od < hi)
        ok = t["o_orderkey"].to_numpy()[m]
        hit, c_nat = _probe(cust_ref, t["o_custkey"].to_numpy()[m])
        return {"o_orderkey": ok[hit], "c_nat": c_nat}

    def lineitem_side(t: pa.Table):
        hit, s_nat = _probe(supp_ref, t["l_suppkey"].to_numpy().astype(np.int64))
        rev = (
            t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        )[hit]
        return {
            "l_orderkey": t["l_orderkey"].to_numpy()[hit],
            "s_nat": s_nat,
            "rev": rev,
        }

    orders = _pq(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)
    items = _pq(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", zero_copy_batch=True)
    joined = orders.join(
        items,
        join_type="inner",
        num_partitions=NPARTS,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial_by_nation(t: pa.Table):
        c_nat = t["c_nat"].to_numpy()
        same = c_nat == t["s_nat"].to_numpy()
        sums = np.bincount(
            np.searchsorted(nat_keys, c_nat[same]),
            weights=t["rev"].to_numpy()[same],
            minlength=len(nat_keys),
        )
        return {"n_name": np.array(names, dtype=object), "rev_part": sums}

    agg = (
        joined.map_batches(partial_by_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name", num_partitions=NPARTS)
        .aggregate(Sum("rev_part", alias_name="revenue"))
    )
    t = to_arrow(agg)
    t = t.filter(pc.greater(t["revenue"], 0.0))
    return _round(t, {"revenue": 2})


def inactive_customers(sf_dir: str, *, cutoff: str = "2001-01-01"):
    """Anti-join (NOT EXISTS): customers with no order on/after the
    cutoff — the "sources with no crawl snapshot since date X" shape.

    Physical plan: the right side is projected to its key column at the
    read, reduced to per-block unique partials (combiner), unioned on the
    driver (bounded by #distinct active keys — the 10^12-key regime swaps
    this broadcast for the Bloom plan in ``stages/incremental.py``),
    broadcast once via ``ray.put``, and the left side streams through a
    sorted-array MISS probe per batch. No shuffle touches either table.
    """
    cut = np.datetime64(cutoff, "us")
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def active_partial(t: pa.Table):
        m = t["o_orderdate"].to_numpy() >= cut
        return {"k": np.unique(t["o_custkey"].to_numpy()[m])}

    parts = [
        b["k"].to_numpy()
        for b in orders.map_batches(
            active_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    seen = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    seen_ref = ray.put(seen)

    def miss(t: pa.Table) -> pa.Table:
        k = ray.get(seen_ref)
        ck = t["c_custkey"].to_numpy()
        if len(k) == 0:
            return t
        idx = np.minimum(np.searchsorted(k, ck), len(k) - 1)
        return t.filter(pa.array(k[idx] != ck))

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cust.map_batches(miss, batch_format="pyarrow", zero_copy_batch=True)


def orders_priority_count(sf_dir: str):
    ds = _pq(sf_dir, "orders", columns=["o_orderpriority"])
    return to_arrow(
        ds.groupby("o_orderpriority", num_partitions=NPARTS).aggregate(
            Count(alias_name="n")
        )
    )


def lineitem_revenue(sf_dir: str):
    """Per-row filter + project + computed column (M11/M12 class)."""
    ds = _pq(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
                 "l_quantity"],
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 30.0))
        # 4dp: finer than the 2dp x 2dp product's intrinsic decimals, so
        # no value sits on a rounding half-boundary; _round_np matches
        # DuckDB's scale/rint/unscale bit-for-bit
        rev = pa.array(
            _round_np(
                t["l_extendedprice"].to_numpy()
                * (1.0 - t["l_discount"].to_numpy()),
                4,
            )
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": rev,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def zscore_quantity(sf_dir: str):
    """Two-pass z-score (M1, nlsh/data.py:29-33): distributed partial
    sums -> broadcast stats -> per-row normalize."""
    ds = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy()
        return pa.table(
            {
                "s": pa.array([float(q.sum())]),
                "ss": pa.array([float((q * q).sum())]),
                "n": pa.array([len(q)]),
            }
        )

    parts = ds.select_columns(["l_quantity"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = sum(p["n"] for p in parts)
    mean = sum(p["s"] for p in parts) / n
    var = max(sum(p["ss"] for p in parts) / n - mean * mean, 0.0)
    std = var**0.5
    stats_ref = ray.put((mean, std))

    def norm(t: pa.Table) -> pa.Table:
        mu, sd = ray.get(stats_ref)
        z = (t["l_quantity"].to_numpy() - mu) / sd
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "z_qty": pa.array(np.round(z, 6)),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per user (windowed aggregate; ray_guide
    'streaming-shaped workloads')."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy()  # epoch micros
        hour = us // 3_600_000_000
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_hour": pa.array(hour, pa.int64()),
                "value": t["value"],
            }
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_hour"], num_partitions=NPARTS)
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return _round(to_arrow(out), {"sum_value": 4})


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization per user (session window semantics,
    §2.9). A new session starts when the gap to the previous event
    exceeds ``gap_minutes``. Segmented-numpy kernel in
    ``stages/window.py`` — no pandas (VERDICT r3 #4)."""
    from nlshray.stages.window import session_window

    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "value"])
    return session_window(
        ds, key="user_id", ts="ts", value="value",
        gap_seconds=gap_minutes * 60, num_partitions=NPARTS,
    )


def events_sliding(sf_dir: str):
    """Per-event trailing 1-hour window (count + max) per user — the
    sliding-window member of §2.9 (tumbling = events_hourly, session =
    events_sessionize). COUNT/MAX only: order-independent, so bit-exact
    against the SQL RANGE-frame oracle (a windowed SUM of doubles would
    not be — BASELINE.md parity notes)."""
    from nlshray.stages.window import sliding_window

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = sliding_window(
        ds, key="user_id", ts="ts", value="value", id_col="event_id",
        window_seconds=3600, num_partitions=NPARTS,
    )
    return _round(to_arrow(out), {"max_value": 6})


def events_debounced(sf_dir: str, *, min_gap_hours: int = 24):
    """Rapid-repeat collapse: a (user, event_type) row survives only if
    the previous same-key event is more than ``min_gap_hours`` older —
    the telemetry/crawl-snapshot debounce (``stages/window.py
    debounce``, LAG semantics so the rule is SQL-replayable)."""
    from nlshray.stages.window import debounce

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    return debounce(
        ds,
        keys=["user_id", "event_type"],
        ts="ts",
        id_col="event_id",
        min_gap_seconds=min_gap_hours * 3600,
        num_partitions=NPARTS,
    )


def events_running_totals(sf_dir: str):
    """Per-user running totals: each event annotated with the count and
    fixed-point sum of that user's events up to and including it in
    ``(ts, event_id)`` order — the cumulative-window member of the
    events family (tumbling ★, session ★, sliding ★, debounce ★,
    cumulative ★). Hash-exact vs a ROWS-frame SQL window oracle because
    values are floor-quantized to 1e-4 and summed in int64
    (``stages/window.py running_totals``)."""
    from nlshray.stages.window import running_totals

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return running_totals(
        ds,
        key="user_id",
        ts="ts",
        value="value",
        id_col="event_id",
        num_partitions=NPARTS,
    )


def events_asof_orders(sf_dir: str):
    """As-of join: each event enriched with the user's most recent order
    at or before the event time (ties: greatest o_orderkey). The
    canonical 'attach latest dimension state to a fact stream' op —
    one co-partitioning shuffle, vectorized searchsorted per group."""
    from nlshray.stages.joins import asof_join

    events = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _pq(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda t: t.rename_columns(
            ["user_id", "o_orderkey", "o_orderdate", "o_totalprice"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = asof_join(
        events, orders,
        on="user_id", left_ts="ts", right_ts="o_orderdate",
        left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
        right_tie="o_orderkey",
        num_partitions=NPARTS,
    )
    tbl = to_arrow(out).select(["event_id", "o_orderkey", "o_totalprice"])
    return tbl.rename_columns(["event_id", "last_order_key", "last_order_price"])


def events_range_pairs(sf_dir: str):
    """Range self-join: canonical pairs of same-user events within 10
    minutes of each other — the range-join member of the join family
    (broadcast ★, shuffle ★, as-of ★, range ★)."""
    from nlshray.stages.joins import range_self_join

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return range_self_join(
        ds, on="user_id", ts="ts", id_col="event_id",
        window_seconds=600, num_partitions=NPARTS,
    )


# ---------------------------------------------------------------------------
# dedup family over documents
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(sf_dir: str):
    """Pivot: per-user event counts spread across one column per event
    type (the wide-format activity matrix). Per block, a 2D bincount over
    (local user code, event-type code) collapses the batch to one partial
    row per user seen — the combiner — and the single shuffle moves only
    those already-wide partials; the final groupby just sums them."""
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"])
    type_arr = pa.array(_EVENT_TYPES)
    n_types = len(_EVENT_TYPES)

    def partial(t: pa.Table):
        codes = pc.index_in(t["event_type"], type_arr)
        if codes.null_count:
            raise ValueError("event_type outside the declared category set")
        codes = codes.to_numpy(zero_copy_only=False)
        users, inv = np.unique(t["user_id"].to_numpy(), return_inverse=True)
        counts = np.zeros((len(users), n_types), dtype=np.int64)
        np.add.at(counts, (inv, codes.astype(np.int64)), 1)
        out = {"user_id": users}
        for j, name in enumerate(_EVENT_TYPES):
            out[f"n_{name}"] = counts[:, j]
        return out

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id", num_partitions=NPARTS)
        .aggregate(
            *[Sum(f"n_{name}", alias_name=f"n_{name}") for name in _EVENT_TYPES]
        )
    )
    t = to_arrow(agg)
    total = np.sum([t[f"n_{n}"].to_numpy() for n in _EVENT_TYPES], axis=0)
    return t.append_column("n_total", pa.array(total, pa.int64()))


def exact_dup_docs(sf_dir: str):
    """Exact dedup groups: keep_id = min doc_id per identical text."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_stage(docs, num_partitions=NPARTS)
    t = to_arrow(out.select_columns(["doc_id", "rep_id", "n_copies"]))
    return t.rename_columns(["doc_id", "keep_id", "n_copies"])


def token_counts(sf_dir: str):
    """Whitespace tokens + BPE-ish pieces (words | single punct) per
    doc — both as single vectorized RE2 count kernels, no per-row
    Python (the scalar twins in functions/textstats.py define the
    semantics and are golden-tested equal)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n_ws = pc.count_substring_regex(arr, r"\S+")
        n_pieces = pc.count_substring_regex(
            arr, r"[0-9a-zA-Z_]+|[^0-9a-zA-Z_\s]"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": n_ws.cast(pa.int64()),
                "n_pieces": n_pieces.cast(pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def doc_stats(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.utf8_length(arr).cast(pa.int64()),
                "n_ws_tokens": pc.count_substring_regex(arr, r"\S+").cast(
                    pa.int64()
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_summary(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"])
    out = docs.groupby("lang", num_partitions=NPARTS).aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )
    return _round(to_arrow(out), {"avg_chars": 4})


def quality_scores(sf_dir: str):
    """Quality/lang-ID/fingerprint features — fully DuckDB-oracled
    (``_build_quality_scores_oracle`` replays the stopword argmax and
    the 8-gram rolling-min fingerprint in SQL)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats_stage(docs)


def source_summary(sf_dir: str):
    """Corpus-composition report per source — what a data curator runs
    before mixing training data: doc/token/char volumes and the count
    of quality-flagged docs per provenance. Combiner-style: each batch
    pre-aggregates its per-source partials inside ``map_batches`` (the
    quality kernel runs exactly once per doc), so the groupby shuffles
    only a few rows per (block, source). Integer partials sum exactly
    at any parallelism; the one ratio is derived after the aggregate."""
    from nlshray.functions.textstats import batch_textstats

    docs = _pq(
        sf_dir, "documents", columns=["text", "source", "n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        f = batch_textstats(t["text"])
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        srcs, inv = np.unique(src, return_inverse=True)
        k = srcs.shape[0]

        def isum(v) -> np.ndarray:
            out = np.zeros(k, np.int64)
            np.add.at(out, inv, v.astype(np.int64))
            return out

        return pa.table(
            {
                "source": pa.array(list(srcs), pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
                "total_tokens": pa.array(isum(f["n_tokens"])),
                "total_chars": pa.array(isum(t["n_chars"].to_numpy())),
                "n_low_quality": pa.array(isum(f["quality"] < 1.0)),
            }
        )

    partials = docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby("source", num_partitions=8).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
        Sum("total_chars", alias_name="total_chars"),
        Sum("n_low_quality", alias_name="n_low_quality"),
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = t["total_chars"].to_numpy() / np.maximum(
            t["n_docs"].to_numpy(), 1
        )
        return t.append_column("avg_chars", pa.array(_round_np(avg, 4)))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats(sf_dir: str):
    """Gopher-style repetition/boilerplate signals per doc (duplicate-
    token fraction, top-1-gram fraction; Rae et al. 2021 §A1.1) —
    DuckDB-oracled on actual token strings while the Ray kernel runs on
    64-bit token hashes (a collision would fail the oracle)."""
    from nlshray.stages.textstats import token_repetition_arrays

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        f = token_repetition_arrays(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(f["n_tokens"]),
                "n_distinct_tokens": pa.array(f["n_distinct_tokens"]),
                "dup_token_frac": pa.array(
                    _round_np(f["dup_token_frac"], 6)
                ),
                "top_token_frac": pa.array(
                    _round_np(f["top_token_frac"], 6)
                ),
                "max_token_count": pa.array(f["max_token_count"]),
                "n_bigrams": pa.array(f["n_bigrams"]),
                "dup_bigram_frac": pa.array(
                    _round_np(f["dup_bigram_frac"], 6)
                ),
                "top_bigram_frac": pa.array(
                    _round_np(f["top_bigram_frac"], 6)
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pii_redacted(sf_dir: str):
    """PII scrub demo over deterministically-augmented text (the
    synthetic corpus carries no PII, so docs get seeded synthetic
    emails/phones/IPs appended — replicated verbatim in the SQL oracle —
    and the generic ``pii_stage`` kernels scrub them). Counts are taken
    sequentially per pattern, exactly as ``stages/clean.py`` defines."""
    from nlshray.stages.clean import scrub_batch

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        txt = t["text"].to_numpy(zero_copy_only=False).astype(object)
        ds = d.astype(str).astype(object)
        pad = np.char.zfill((d % 10000).astype(str), 4).astype(object)
        sfx1 = np.where(
            d % 7 == 0,
            " contact user" + ds + "@example.com or 555-867-" + pad,
            "",
        ).astype(object)
        ip = (
            " from 10.0."
            + (d % 256).astype(str).astype(object)
            + "."
            + ((d // 256) % 256).astype(str).astype(object)
        )
        sfx2 = np.where(d % 11 == 0, ip, "").astype(object)
        aug = pa.array(list(txt + sfx1 + sfx2), pa.string())
        clean, counts = scrub_batch(aug)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_email": pa.array(counts["email"]),
                "n_phone": pa.array(counts["phone"]),
                "n_ipv4": pa.array(counts["ipv4"]),
                "clean_text": clean,
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


DECONTAM_K = 8  # flag any doc sharing an 8-token n-gram with the eval set


def decontaminated_docs(sf_dir: str):
    """Benchmark decontamination: docs with ``doc_id % 50 == 8`` stand in
    for the held-out eval set; every other doc sharing a DISTINCT
    8-token n-gram with any eval doc is flagged (``stages/decontam.py``
    — broadcast eval-gram set, streaming corpus probe)."""
    from nlshray.stages.decontam import decontam_stage, eval_ngram_set

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def eval_only(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        return t.filter(pa.array(did % 50 == 8))

    eval_ds = docs.map_batches(
        eval_only, batch_format="pyarrow", zero_copy_batch=True
    )
    ev = eval_ngram_set(eval_ds, DECONTAM_K, seed=CFG.seed)
    return decontam_stage(
        docs,
        ev,
        DECONTAM_K,
        seed=CFG.seed,
        is_eval_fn=lambda did: did % 50 == 8,
    )


def packed_sequences(sf_dir: str):
    """Global sequence packing (``stages/pack.py``): every doc's global
    token offset and [first_seq, last_seq] window at seq_len=512, docs
    concatenated in doc_id order. Whitespace-token counts (the
    ``token_counts`` definition)."""
    from nlshray.stages.pack import pack_sequences

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(docs, seq_len=512, chunk_size=128)


def minhash_signatures(sf_dir: str):
    """128-perm MinHash signatures; first 4 slots exposed as int64 columns
    (63-bit-masked), DuckDB-oracled — the signature is a pure function of
    the text bytes + config seed, and ``_build_minhash_oracle`` replays
    the token-hash -> shingle-fold -> permutation-min chain in SQL."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = sign_stage(docs, CFG)

    def expand(t: pa.Table) -> pa.Table:
        m = sigs_to_numpy(t["sig"], CFG.num_perms)
        cols = {"doc_id": t["doc_id"]}
        for i in range(4):
            cols[f"sig_{i}"] = pa.array(
                (m[:, i] & np.uint64((1 << 63) - 1)).astype(np.int64)
            )
        return pa.table(cols)

    return sigs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def near_dup_pairs(sf_dir: str):
    """Confirmed MinHash/LSH near-dup pairs over documents at the real
    threshold (0.8) — DuckDB-oracled: ``_build_near_dup_pairs_oracle``
    replays the whole tokenize -> shingle -> 128-perm MinHash -> band ->
    candidate -> exact-Jaccard chain in SQL."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    res = dedup_docs(docs, CFG, num_partitions=NPARTS)
    return _round(
        to_arrow(res.pairs.select_columns(["left_id", "right_id", "jaccard"])),
        {"jaccard": 6},
    )


def near_dup_clusters(sf_dir: str):
    """Full dedup clustering over documents at threshold 0.8 —
    DuckDB-oracled end-to-end (kernel-chain replay + recursive min-label
    components, ``_build_near_dup_clusters_oracle``)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    res = dedup_docs(docs, CFG, num_partitions=NPARTS)
    return to_arrow(res.clusters)


def near_dup_clusters_t1(sf_dir: str):
    """The FULL MinHash/LSH/verify/cluster pipeline at threshold=1.0 —
    SQL-checkable from first principles: Jaccard 1.0 is an equivalence
    relation (identical shingle SETS), identical sets collide in every
    LSH band, and exact verification rejects everything below 1.0, so
    the engine's clusters must equal DuckDB's groups over a canonical
    shingle-set key. Oracles the same machinery near_dup_clusters runs
    at 0.8 (VERDICT r1 #6)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    cfg = DedupConfig(threshold=1.0)
    res = dedup_docs(docs, cfg, num_partitions=NPARTS)
    return to_arrow(res.clusters)


def cross_near_dup_pairs(sf_dir: str):
    """Decontamination join (``stages/crossdup.cross_near_dups``): every
    (corpus_doc, probe_doc) exact or near duplicate at the flagship
    threshold, probes = docs with doc_id % 10 == 7. The plan broadcasts
    the probe side's band keys so the corpus never self-pairs — its band
    rows only shuffle when they land in a probe bucket; driver state is
    bounded by the probe side, never the corpus. Oracle: the flagship
    union chain filtered to cross-side pairs and expanded through the
    exact-dup membership map."""
    from nlshray.stages.crossdup import cross_near_dups

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_probe", pa.array(t["doc_id"].to_numpy() % 10 == 7)
        )

    flagged = docs.map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )
    return to_arrow(cross_near_dups(flagged, CFG, num_partitions=NPARTS))


def edit_distance_pairs(sf_dir: str):
    """Edit-distance verification of the flagship's confirmed near-dup
    pairs — the character-level second opinion a curation pipeline runs
    before destructive collapse (shingle-Jaccard can score reorderings
    high; Levenshtein cannot).

    Plan: the pair list is small relative to the corpus, so the texts of
    pair-involved docs are gathered with a broadcast id probe (corpus
    streams, never shuffles) and shipped once via ``ray.put``; each pair
    block then runs the batched prefix-min Levenshtein kernel
    (``functions/distances.levenshtein_batch`` — one vectorized
    ``minimum.accumulate`` per DP row for the whole batch). Oracle:
    the full minhash-chain SQL composed with DuckDB ``levenshtein``.
    """
    from nlshray.functions.distances import levenshtein_batch

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    res = dedup_docs(docs, CFG, num_partitions=NPARTS)
    pairs = res.pairs.select_columns(["left_id", "right_id"])
    pair_tbl = to_arrow(pairs.materialize())
    if pair_tbl.num_rows == 0:
        return pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "edit_distance": pa.array([], pa.int64()),
            }
        )
    ids = np.unique(
        np.concatenate(
            [pair_tbl["left_id"].to_numpy(), pair_tbl["right_id"].to_numpy()]
        )
    )
    ids_ref = ray.put(ids)

    def gather(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        d = t["doc_id"].to_numpy()
        idx = np.minimum(np.searchsorted(wanted, d), len(wanted) - 1)
        return t.filter(pa.array(wanted[idx] == d))

    texts = to_arrow(
        docs.map_batches(gather, batch_format="pyarrow", zero_copy_batch=True).materialize()
    )
    tmap_ref = ray.put(
        dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    )

    def dist(t: pa.Table):
        m = ray.get(tmap_ref)
        lt = [m[i] for i in t["left_id"].to_pylist()]
        rt = [m[i] for i in t["right_id"].to_pylist()]
        return {
            "left_id": t["left_id"],
            "right_id": t["right_id"],
            "edit_distance": levenshtein_batch(lt, rt),
        }

    return pairs.map_batches(dist, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores_sql(sf_dir: str):
    """The SQL-expressible core of the quality operator (everything but
    the hash-based fingerprint/lang columns of ``quality_scores``) —
    bit-exact ratios and the composite score, DuckDB-checkable."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    stats = textstats_stage(docs)
    return stats.select_columns(
        [
            "doc_id",
            "n_tokens",
            "n_pieces",
            "mean_token_len",
            "punct_ratio",
            "stop_ratio",
            "digit_ratio",
            "quality",
        ]
    )


def sampled_docs(sf_dir: str, fraction: float = 0.2):
    """Seeded corpus sampling (T2 analog of the reference's seeded
    train-row sampling). Hash-based rather than RNG-based: a doc is in
    the sample iff ``splitmix64(doc_id ^ seed_mix(seed)) < frac * 2^64``
    — a pure function of (doc_id, seed, fraction), so the sample is
    identical at ANY parallelism/partitioning, composable with resume
    (a re-run re-selects the same rows), and DuckDB-oracle-able.
    ``Dataset.random_sample(seed=)`` would tie the sample to Ray's
    block RNG stream (parallelism-dependent at scale)."""
    from nlshray.hashing import _seed_mix, splitmix64

    thr = np.uint64(int(fraction * float(2**64)))
    mix = _seed_mix(CFG.seed)

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        return t.filter(pa.array(splitmix64(ids ^ mix) < thr))

    docs = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return docs.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def source_lang_rollup(sf_dir: str):
    """ROLLUP(source, lang) in ONE streaming pass — the corpus-composition
    report at every granularity: (source, lang), (source), and the grand
    total, distinguished by ``level`` (0/1/2, = number of rolled-up keys).

    Per block, pyarrow's C++ ``Table.group_by`` collapses the batch to
    per-(source, lang) partials and the two coarser levels are derived
    from THAT tiny table, so all three levels ride ONE small shuffle —
    the combiner pattern; a naive UNION of three separate groupbys would
    scan and shuffle the input three times.
    """
    docs = _pq(sf_dir, "documents", columns=["source", "lang", "n_chars"])
    ALL = "*ALL*"

    def partials(t: pa.Table):
        g = t.group_by(["source", "lang"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")]
        )
        n0 = len(g)
        g1 = g.group_by(["source"]).aggregate(
            [("n_chars_sum", "sum"), ("n_chars_count", "sum")]
        )
        n1 = len(g1)
        out = {
            "source": pa.concat_arrays(
                [
                    g["source"].combine_chunks(),
                    g1["source"].combine_chunks(),
                    pa.array([ALL]),
                ]
            ),
            "lang": pa.concat_arrays(
                [g["lang"].combine_chunks(), pa.array([ALL] * (n1 + 1))]
            ),
            "level": np.concatenate(
                [np.zeros(n0, np.int64), np.ones(n1, np.int64), [2]]
            ),
            "c": np.concatenate(
                [
                    g["n_chars_sum"].to_numpy(),
                    g1["n_chars_sum_sum"].to_numpy(),
                    [g["n_chars_sum"].to_numpy().sum()],
                ]
            ),
            "d": np.concatenate(
                [
                    g["n_chars_count"].to_numpy(),
                    g1["n_chars_count_sum"].to_numpy(),
                    [g["n_chars_count"].to_numpy().sum()],
                ]
            ),
        }
        return out

    agg = (
        docs.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang", "level"], num_partitions=NPARTS)
        .aggregate(Sum("d", alias_name="n_docs"), Sum("c", alias_name="sum_chars"))
    )
    return to_arrow(agg)


def corpus_diff(sf_dir: str):
    """Snapshot diff (the crawl-over-crawl audit): FULL OUTER join of
    two corpus snapshots on doc_id -> one row per added / removed /
    changed doc. The "new" snapshot is derived deterministically from
    the same table so the oracle can replay it: doc_id % 10 == 0 docs
    are dropped (removed), % 7 == 0 docs are uppercased (changed), and
    % 13 == 0 docs reappear under doc_id + 1,000,000 (added).

    Both sides project to (doc_id, text) at the read; the one shuffle
    is the hash-partitioned full-outer ``Dataset.join`` — the join-type
    matrix counterpart to the inner (top_customers / q5), as-of, range
    and anti (inactive_customers) joins elsewhere in this file.
    """
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def old_side(t: pa.Table):
        return {"doc_id": t["doc_id"], "text_old": t["text"]}

    def new_side(t: pa.Table):
        ids = t["doc_id"].to_numpy()
        kept = t.filter(pa.array(ids % 10 != 0))
        kids = kept["doc_id"].to_numpy()
        txt = pc.if_else(
            pa.array(kids % 7 == 0),
            pc.utf8_upper(kept["text"].combine_chunks()),
            kept["text"].combine_chunks(),
        )
        base = pa.table({"doc_id": pa.array(kids), "text_new": txt})
        adds = t.filter(pa.array(ids % 13 == 0))
        atxt = pc.binary_join_element_wise(
            adds["text"].combine_chunks(),
            pa.array(["v2"] * len(adds)),
            " ",
        )
        extra = pa.table(
            {"doc_id": pa.array(adds["doc_id"].to_numpy() + 1_000_000), "text_new": atxt}
        )
        return pa.concat_tables([base, extra])

    old = docs.map_batches(old_side, batch_format="pyarrow", zero_copy_batch=True)
    new = docs.map_batches(new_side, batch_format="pyarrow", zero_copy_batch=True)
    joined = old.join(new, join_type="full_outer", num_partitions=NPARTS, on=("doc_id",))

    def classify(t: pa.Table):
        told, tnew = t["text_old"], t["text_new"]
        removed = pc.is_null(tnew)
        added = pc.is_null(told)
        changed = pc.and_kleene(
            pc.and_(pc.is_valid(told), pc.is_valid(tnew)),
            pc.not_equal(told, tnew),
        )
        keep = pc.or_(pc.or_(removed, added), pc.fill_null(changed, False))
        kept = t.filter(keep)
        status = pc.if_else(
            pc.is_null(kept["text_new"]),
            pa.scalar("removed"),
            pc.if_else(pc.is_null(kept["text_old"]), pa.scalar("added"), pa.scalar("changed")),
        )
        return pa.table({"doc_id": kept["doc_id"], "status": status})

    out = joined.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    # Boundary hardening (r4 verdict "what's wrong" #1): the full-outer
    # join's output blocks can carry chunked / large_string schema
    # variants that the driver's serializer chokes on mid-compare. The
    # diff itself is tiny by construction (changed/added/removed rows
    # only, ~3% of docs), so gather it and re-emit as ONE plain
    # (int64, string) Arrow table with a frozen schema — nothing wider
    # than (doc_id, status) can reach the driver on any code path.
    schema = pa.schema([("doc_id", pa.int64()), ("status", pa.string())])
    parts = [
        b.select(["doc_id", "status"]).cast(schema)
        for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    tbl = (
        pa.concat_tables(parts).combine_chunks()
        if parts
        else schema.empty_table()
    )
    return rd.from_arrow(tbl)


def quantized_embeddings(sf_dir: str):
    """Int8 symmetric quantization of the embedding column — the storage
    -compression prep for shipping a 100-TB embedding table (4 bytes ->
    1 byte per dim + one float scale per vector; the PQ ANN member is the
    search-side counterpart, this is the export-side one).

    Per vector: scale = max(|e_i|), q_i = round(e_i / scale * 127).
    Arithmetic runs in float64 on both sides (engine and oracle), so the
    comparison is bit-exact. Output is flattened to one row per
    (vec_id, pos) so the DuckDB oracle can replay it with a positional
    unnest zip — list-typed result columns would compare as opaque
    strings in the driver's hash.
    """

    def quantize(t: pa.Table):
        ids = t["vec_id"].to_numpy()
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.flatten().to_numpy()
        d = len(vals) // max(len(t), 1)
        emb = vals.reshape(len(t), d).astype(np.float64)
        mx = np.abs(emb).max(axis=1)
        safe = np.where(mx > 0, mx, 1.0)
        q = np.rint(emb / safe[:, None] * 127.0).astype(np.int64)
        q[mx == 0] = 0
        return {
            "vec_id": np.repeat(ids, d),
            "pos": np.tile(np.arange(d, dtype=np.int64), len(t)),
            "q": q.ravel(),
            "scale": np.repeat(mx, d),
        }

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return emb.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


#: Data-mix weights for ``resampled_corpus``: source -> sampling weight.
#: >1 upsamples (docs repeat), <1 downsamples (seeded Bernoulli keep).
_MIX_WEIGHTS = [2.5, 1.0, 0.5, 0.25]


def _mix_weight(source_index: int) -> float:
    return _MIX_WEIGHTS[source_index % len(_MIX_WEIGHTS)]


def resampled_corpus(sf_dir: str):
    """Data-mix reweighting (the LLM pre-training mix op): resample the
    corpus so each source contributes ``weight`` x its raw share —
    e.g. upsample curated sources 2.5x, keep web at 0.25x.

    A doc with weight ``w`` yields ``floor(w)`` guaranteed copies plus
    one more iff ``splitmix64(doc_id ^ seed) < frac(w) * 2^64`` — a pure
    function of (doc_id, source, seed): identical at any parallelism,
    resume-safe, and replayable in SQL (the oracle unnests
    ``range(n_copies)``). Stochastic-rounding resamplers built on an RNG
    stream would tie the mix to the block layout.

    Output: one row per EMITTED copy — (doc_id, copy, source, n_chars),
    copy = 0..n_copies-1; downsampled-away docs emit no rows.
    """
    from nlshray.hashing import _seed_mix, splitmix64

    mix = _seed_mix(CFG.seed + 17)
    n_src = 20
    base = np.array([int(_mix_weight(i)) for i in range(n_src)], dtype=np.int64)
    frac_thr = np.array(
        [np.uint64(int((_mix_weight(i) % 1.0) * float(2**64))) for i in range(n_src)],
        dtype=np.uint64,
    )

    def expand(t: pa.Table):
        src = pc.cast(
            pc.utf8_slice_codeunits(t["source"], 3, 32), pa.int64()
        ).to_numpy() % n_src
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        n_copies = base[src] + (splitmix64(ids ^ mix) < frac_thr[src])
        rep = np.repeat(np.arange(len(ids)), n_copies)
        ends = np.cumsum(n_copies)
        copy = np.arange(ends[-1] if len(ends) else 0) - np.repeat(ends - n_copies, n_copies)
        picked = t.take(pa.array(rep))
        return picked.append_column("copy", pa.array(copy, pa.int64()))

    docs = _pq(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return docs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def novel_docs_incremental(sf_dir: str):
    """Incremental (new-vs-seen) exact dedup — the daily-crawl filter
    (``stages/incremental.py``): seen = even-doc_id half of the corpus,
    new = odd half; returns the new docs whose text is NOT in seen.
    Broadcast plan at this scale; the bloom + hash-partition scale plan
    is equality-tested against it (``test_incremental``). DuckDB oracle:
    a NOT EXISTS anti-join on text."""
    from nlshray.stages.incremental import novel_docs

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(t["doc_id"].to_numpy() % 2 == parity))

        return f

    seen = docs.map_batches(half(0), batch_format="pyarrow", zero_copy_batch=True)
    new = docs.map_batches(half(1), batch_format="pyarrow", zero_copy_batch=True)
    return novel_docs(new, seen).select_columns(["doc_id", "n_chars"])


def novel_docs_near_incremental(sf_dir: str):
    """Incremental NEAR-dup filter (``stages/incremental.py``
    ``novel_docs_near``): seen = even-doc_id half, new = odd half;
    returns the new docs with NO seen doc at shingle-Jaccard >= 0.8
    (exact text matches count as 1.0). The cross-snapshot MinHash/LSH
    probe a daily crawl runs after the exact filter. DuckDB oracle:
    the flagship kernel-replay chain (``_near_dup_chain_sql``) with the
    confirmed-pair set restricted to cross-side text groups."""
    from nlshray.stages.incremental import novel_docs_near

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(t["doc_id"].to_numpy() % 2 == parity))

        return f

    seen = docs.map_batches(half(0), batch_format="pyarrow", zero_copy_batch=True)
    new = docs.map_batches(half(1), batch_format="pyarrow", zero_copy_batch=True)
    out = novel_docs_near(new, seen, CFG, num_partitions=NPARTS)
    return out.select_columns(["doc_id", "n_chars"])


def top_docs_per_lang(sf_dir: str, k: int = 3):
    """Grouped top-k without a global sort (``stages/topk.py``): the k
    longest docs per language, deterministic tie-break on doc_id.
    Partial top-k per block + one coalesced combine — two streaming
    passes, no shuffle. DuckDB oracle: ROW_NUMBER ... QUALIFY."""
    from nlshray.stages.topk import grouped_topk

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return grouped_topk(docs, "lang", "n_chars", k)


def stratified_sample_by_lang(sf_dir: str, fraction: float = 0.2):
    """Stratified sampling with exact per-language quotas
    (``stages/topk.py``): the ceil(frac x group_size) docs with the
    smallest ``splitmix64(doc_id ^ seed)`` per lang — a pure function of
    (ids, seed, fraction), parallelism-independent and SQL-replayed."""
    from nlshray.stages.topk import stratified_sample

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return stratified_sample(docs, "lang", fraction, seed=CFG.seed)


def length_quantiles_by_lang(sf_dir: str):
    """Exact per-language doc-length quantiles WITHOUT a sort
    (``stages/quantiles.py``): per-block (lang, n_chars, count)
    histogram partials -> one CDF combine; quantile_disc semantics.
    DuckDB oracle: quantile_disc per group."""
    from nlshray.stages.quantiles import grouped_quantiles

    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_quantiles(docs, "lang", "n_chars", [0.25, 0.5, 0.75, 0.95, 0.99])


def score_quantiles_by_lang(sf_dir: str):
    """Exact per-language quantiles of the FLOAT quality score — the
    unbounded-domain member of the quantile family (VERDICT r3 #3):
    order-preserving float64->uint64 bucketing pre-map locates the
    straddling bucket per (lang, q), one targeted second pass gathers
    only those buckets and reads the exact value off the in-bucket
    rank. Answers are copied input values -> bit-exact vs DuckDB
    ``quantile_disc`` over the same SQL-replayed score."""
    from nlshray.stages.quantiles import grouped_quantiles_float

    docs = _pq(sf_dir, "documents", columns=["text", "lang"])
    # the score is a pure function of text, so lang rides along in the
    # same batch — no join needed to pair (lang, quality)
    from nlshray.functions.textstats import batch_textstats

    def score(t: pa.Table) -> pa.Table:
        f = batch_textstats(t["text"], with_fingerprint=False)
        return pa.table(
            {"lang": t["lang"], "quality": pa.array(f["quality"], pa.float64())}
        )

    lang_scores = docs.map_batches(
        score, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    )
    return grouped_quantiles_float(
        lang_scores, "lang", "quality", [0.25, 0.5, 0.75, 0.9]
    )


# ngram_jaccard_pairs routes by corpus size (VERDICT r1 #5): up to this
# many docs the exact all-pairs broadcast member runs; beyond it the
# LSH-banded + exact-verify member takes over (precision 1.0 by exact
# verification; recall ~1-1e-4 at J>=0.9 with the 16x8 banding).
_NGRAM_BF_LIMIT = 20_000


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.9):
    """Exact token-set (1-gram) Jaccard over all doc pairs, >= threshold.

    The brute-force member of the dedup family (SQL-verifiable; DuckDB
    list_intersect oracle). Token sets are hashed per worker, collected
    once and broadcast; each batch scores its docs against the corpus —
    the same broadcast pattern as embedding_near_dup. Above
    ``_NGRAM_BF_LIMIT`` docs the registry routes to the LSH-banded
    member with exact verification (shingle_k=1 == token sets) instead
    of hard-coding the O(n^2) brute member.
    """
    from nlshray.functions.shingles import batch_token_hashes

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    if docs.count() > _NGRAM_BF_LIMIT:
        cfg = DedupConfig(shingle_k=1, threshold=threshold, exact_hi=1.1)
        res = dedup_docs(docs, cfg, num_partitions=NPARTS)
        pairs = to_arrow(res.pairs).select(["left_id", "right_id", "jaccard"])
        return _round(pairs, {"jaccard": 6})

    def tok_sets(t: pa.Table) -> pa.Table:
        """Per-doc UNIQUE token-hash sets via the batch kernel (the same
        tokenizer the LSH route uses, so routing is semantics-preserving
        — ADVICE r2)."""
        flat, counts = batch_token_hashes(t["text"])
        ends = np.cumsum(counts)
        sets = [
            np.unique(flat[e - c : e]).tolist()
            for c, e in zip(counts, ends)
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "toks": pa.array(sets, pa.list_(pa.uint64())),
            }
        )

    ids_c, val_c, len_c = [], [], []
    for b in docs.map_batches(
        tok_sets, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids_c.append(np.asarray(b["doc_id"]))
        col = b["toks"].combine_chunks()
        val_c.append(np.asarray(col.values, dtype=np.uint64))
        len_c.append(np.diff(np.asarray(col.offsets)).astype(np.int64))
    ids = np.concatenate(ids_c) if ids_c else np.empty(0, np.int64)
    lens = np.concatenate(len_c) if len_c else np.empty(0, np.int64)
    vals = np.concatenate(val_c) if val_c else np.empty(0, np.uint64)
    order = np.argsort(ids)
    # reorder the flat value buffer to sorted-id segment order
    seg_ends = np.cumsum(lens)
    seg_starts = seg_ends - lens
    take = np.concatenate(
        [np.arange(seg_starts[i], seg_ends[i]) for i in order]
    ) if ids.shape[0] else np.empty(0, np.int64)
    cids = ids[order]
    csizes = lens[order]
    cends = np.cumsum(csizes)
    corpus_ref = ray.put((cids, vals[take], cends, csizes))

    def pairs(t: pa.Table) -> pa.Table:
        """Each doc's sorted set is intersected against the WHOLE corpus
        flat buffer in one searchsorted + segmented count — no python
        inner loop over corpus docs (VERDICT r2 #7)."""
        cids_, cflat, cends_, csizes_ = ray.get(corpus_ref)
        cstarts_ = cends_ - csizes_
        flat, counts = batch_token_hashes(t["text"])
        qids = t["doc_id"].to_numpy()
        qends = np.cumsum(counts)
        lefts, rights, jacs = [], [], []
        cs_buf = np.empty(cflat.shape[0] + 1, np.int64)
        for i in range(qids.shape[0]):
            mine = np.unique(flat[qends[i] - counts[i] : qends[i]])
            did = qids[i]
            if mine.shape[0]:
                pos = np.searchsorted(mine, cflat)
                pos[pos == mine.shape[0]] = 0
                hits = mine[pos] == cflat
                cs_buf[0] = 0
                np.cumsum(hits, out=cs_buf[1:])
                inter = cs_buf[cends_] - cs_buf[cstarts_]
            else:
                inter = np.zeros(cids_.shape[0], np.int64)
            union = mine.shape[0] + csizes_ - inter
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            sel = (jac >= threshold) & (cids_ > did)
            lefts.append(np.full(int(sel.sum()), did, np.int64))
            rights.append(cids_[sel])
            jacs.append(_round_np(jac[sel], 6))
        return pa.table(
            {
                "left_id": pa.array(
                    np.concatenate(lefts) if lefts else np.empty(0, np.int64)
                ),
                "right_id": pa.array(
                    np.concatenate(rights) if rights else np.empty(0, np.int64)
                ),
                "jaccard": pa.array(
                    np.concatenate(jacs) if jacs else np.empty(0, np.float64)
                ),
            }
        )

    return docs.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )


def substring_dups(sf_dir: str):
    """Verbatim-substring duplication (winnowed rolling-hash fingerprints,
    the suffix-array-family dedup; rows-only — fingerprint selection is
    hash-seeded, not SQL-expressible)."""
    from nlshray.stages.substring import substring_dup_pairs

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return to_arrow(
        substring_dup_pairs(docs, cfg=CFG, num_partitions=NPARTS)
    )


def simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs, Hamming <= 3 — DuckDB-oracled (r2 #3).

    The simhash is a pure function of the text bytes (ASCII tokens,
    mod-2^64 poly fold + splitmix64 + bit votes), so the oracle
    recomputes it in SQL (HUGEINT modular arithmetic) and self-joins
    with ``bit_count(xor) <= 3``; the 4x16-bit banding is EXACT at
    Hamming<=3 by pigeonhole, so the two plans are semantically equal,
    not just approximately."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return to_arrow(
        simhash_dedup(docs, max_hamming=3, seed=CFG.seed, cfg=CFG,
                      num_partitions=NPARTS).select_columns(
            ["left_id", "right_id", "left_simhash", "right_simhash", "hamming"]
        )
    )


# ---------------------------------------------------------------------------
# ANN / embeddings
# ---------------------------------------------------------------------------

def _query_vectors(sf_dir: str, n: int = 5):
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    head.sort(key=lambda r: r["vec_id"])
    q = np.array([r["embedding"] for r in head], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in head], dtype=np.int64)
    return emb, q, qids


def _index_dir(sf_dir: str) -> str:
    """Per-corpus IndexStore root: HNSW graphs / IVF centroids / PQ
    codebooks build once per corpus and reload on every later query run
    (artifacts are content-addressed, so a changed corpus just misses)."""
    import hashlib as _hl
    import os as _os

    tag = _hl.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    return _os.path.join("/tmp", "nlshray_index", tag)


def knn_cosine(sf_dir: str):
    """Exact cosine top-10 for query vectors vec_id<5 (A5/J1/T1 family)."""
    emb, q, qids = _query_vectors(sf_dir)
    out = knn_bruteforce(emb, q, qids, k=10)
    return _round(to_arrow(out), {"sim": 6})


def _quantize_rows(emb: np.ndarray) -> np.ndarray:
    """Per-row symmetric int8 quantization (same kernel as
    ``quantized_embeddings``), returned as float64 integer values."""
    mx = np.abs(emb).max(axis=1)
    safe = np.where(mx > 0, mx, 1.0)
    q = np.rint(emb / safe[:, None] * 127.0)
    q[mx == 0] = 0
    return q


def knn_cosine_int8(sf_dir: str):
    """Top-10 by cosine over int8-QUANTIZED vectors — the memory-scale
    serving path (1 byte/dim in the object store instead of 4): cosine is
    scale-invariant, so the per-vector quantization scale cancels and the
    metric is a pure function of the integer codes. All dot products are
    sums of integers < 2^24 — exactly representable in float64 — so the
    DuckDB replay (quantize in SQL, ``list_cosine_similarity`` on the
    codes) is value-exact, unlike any other approximate kNN member.
    """
    from nlshray.stages.ann import vectors_from_batch

    emb, q, qids = _query_vectors(sf_dir)
    dim = q.shape[1]
    q8 = _quantize_rows(q)

    def quantize(t: pa.Table):
        m = _quantize_rows(vectors_from_batch(t["embedding"], dim))
        return {
            "vec_id": t["vec_id"],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float64()), dim
            ),
        }

    emb8 = emb.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)
    out = knn_bruteforce(emb8, q8, qids, k=10, dim=dim)
    return _round(to_arrow(out), {"sim": 6})


def knn_cosine_lsh(sf_dir: str):
    """Hyperplane-LSH approximate top-10 (rows-only; approximate by
    design — recall vs brute force asserted in tests instead)."""
    emb, q, qids = _query_vectors(sf_dir)
    # the testdata embeddings are near-random (top-10 neighbors sit at
    # cosine ~0.4), so bucket-collision recall is theory-bounded: with 8
    # planes and Hamming<=3 probing, ~0.5 vs brute force — asserted as a
    # floor in tests; real clustered embeddings score far higher
    out = knn_lsh(emb, q, qids, k=10, n_planes=8, multiprobe=3, seed=CFG.seed)
    return _round(to_arrow(out), {"sim": 6})


def knn_neural(sf_dir: str):
    """Neural-LSH k-NN (the reference's core pipeline: TRAIN hash head on
    the corpus -> code -> bucket -> multi-probe -> exact re-rank),
    rows-only — the hash space is model-defined, not SQL-expressible.

    The head is fit on the corpus itself (deterministic ITQ,
    ``fit_hash_weights``) — measured to roughly double recall over random
    hyperplanes at the same probe budget (the reference's checkpoint
    gate: recall up, candidates not up; trainers/base.py:100-103)."""
    from nlshray.stages.neural import fit_hash_weights, neural_knn

    emb, q, qids = _query_vectors(sf_dir)
    corpus = np.array(
        to_arrow(emb)["embedding"].to_pylist(), dtype=np.float64
    )
    # bits sizes the bucket count: 2^6 buckets keeps ~8-80 docs/bucket at
    # sf test scales (the reference uses 12 bits for a 1.18M corpus —
    # same ~300/bucket ballpark)
    weights = fit_hash_weights(corpus, bits=6)
    out = neural_knn(
        emb, q, qids, k=10, bits=6, n_probes=8, seed=CFG.seed, dim=64,
        weights=weights,
    )
    return _round(to_arrow(out), {"sim": 6})


def knn_neural_trained(sf_dir: str):
    """Neural-LSH k-NN with the SUPERVISED triplet-trained head — the
    reference's actual end-to-end loop (precompute true kNN ->
    triplet-train encoder+hash with Adam(amsgrad) -> checkpoint-gate on
    recall-up/candidates-down -> bucket -> multi-probe -> exact re-rank;
    ``/root/reference/nlsh/trainers/base.py:36-115``,
    ``trainers/triplet.py:16-27``). Rows-only: the hash space is
    model-defined. Recall vs brute force gated in ``tests/test_train.py``
    / ``test_neural.py``; this entry exercises the trained head through
    the same distributed serving path as ``knn_neural``."""
    from nlshray.stages.train import fit_triplet_weights
    from nlshray.stages.neural import neural_knn
    from nlshray.state.indexstore import IndexStore, fingerprint_arrays

    emb, q, qids = _query_vectors(sf_dir)
    corpus = np.array(
        to_arrow(emb)["embedding"].to_pylist(), dtype=np.float64
    )
    # S5/S6 parity for the trained head: fit once per (corpus, params),
    # persist npz via the IndexStore, reload on every later run
    params = {"bits": 6, "hidden": (32,), "epochs": 3, "seed": CFG.seed}
    store = IndexStore(_index_dir(sf_dir))
    fp = fingerprint_arrays({"train": corpus}, params)
    weights = store.load("triplet", fp)
    if weights is None:
        weights = fit_triplet_weights(
            corpus, bits=6, hidden=(32,), epochs=3, seed=CFG.seed
        )
        store.save("triplet", fp, weights)
    out = neural_knn(
        emb, q, qids, k=10, bits=6, n_probes=8, seed=CFG.seed, dim=64,
        weights=weights,
    )
    return _round(to_arrow(out), {"sim": 6})


def knn_hnsw_graph(sf_dir: str):
    """HNSW graph-index top-10 — the reference's competitor baseline
    (hnswlib in ``trainers/hnsw.py:28-48``) rebuilt library-free and
    sharded (ST5). Rows-only: graph search is approximate by design;
    recall vs brute force is gated in ``tests/test_hnsw.py`` instead
    (and is 1.0 at these ef settings on the sf fixtures)."""
    emb, q, qids = _query_vectors(sf_dir)
    out = knn_hnsw(emb, q, qids, k=10, ef_search=64, seed=CFG.seed,
                   index_dir=_index_dir(sf_dir))
    return _round(to_arrow(out), {"sim": 6})


def knn_ivf_probe(sf_dir: str):
    """IVF (k-means inverted-file) top-10 — the coarse-quantizer member
    of the ANN family. Rows-only: bucket membership is quantizer-defined;
    recall vs brute force is gated in tests (near-1 at these settings)."""
    emb, q, qids = _query_vectors(sf_dir)
    out = knn_ivf(emb, q, qids, k=10, n_centroids=16, nprobe=6, seed=CFG.seed,
                  index_dir=_index_dir(sf_dir))
    return _round(to_arrow(out), {"sim": 6})


def knn_pq_adc(sf_dir: str):
    """Product-quantization asymmetric-distance top-10 — implements the
    extension the reference only declared (``nlsh/hashings.py:142-145``
    is a ``pass`` stub). 16 uint8 codes per vector; rows-only
    (quantized distances are approximate by construction; recall gated
    in tests)."""
    emb, q, qids = _query_vectors(sf_dir)
    out = knn_pq(emb, q, qids, k=10, n_subspaces=16, n_centroids=16,
                 seed=CFG.seed, index_dir=_index_dir(sf_dir))
    return _round(to_arrow(out), {"sim": 6})


def embedding_dup_pairs(sf_dir: str):
    """All-pairs cosine >= 0.45 over embeddings (exact at sf scale,
    SQL-checkable; ``strategy="auto"`` flips to the bucketed LSH member
    past the broadcast limit instead of hard-coding the brute member)."""
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_near_dup(emb, threshold=0.45, strategy="auto")
    return _round(to_arrow(out), {"cosine": 6})


def embedding_novelty_incremental(sf_dir: str):
    """Embedding-space member of the incremental dedup family
    (``stages/ann.embedding_novelty``): seen = even vec_ids, new = odd;
    returns the new vectors with NO seen vector at cosine >= 0.45.
    Brute plan at sf scale (seen matrix broadcast once, one matmul +
    any-hit filter per new batch); the LSH-bucketed cross plan is the
    10^12 path (recall-traded, superset-tested in pytest)."""
    from nlshray.stages.ann import embedding_novelty

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(
                pa.array(t["vec_id"].to_numpy() % 2 == parity)
            )

        return f

    seen = emb.map_batches(half(0), batch_format="pyarrow", zero_copy_batch=True)
    new = emb.map_batches(half(1), batch_format="pyarrow", zero_copy_batch=True)
    out = embedding_novelty(new, seen, threshold=0.45, strategy="auto")
    return out.select_columns(["vec_id", "label"])


# ---------------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "top_customers": top_customers,
    "q5_region_volume": q5_region_volume,
    "inactive_customers": inactive_customers,
    "orders_priority_count": orders_priority_count,
    "lineitem_revenue": lineitem_revenue,
    "zscore_quantity": zscore_quantity,
    "events_hourly": events_hourly,
    "events_sessionize": events_sessionize,
    "events_sliding": events_sliding,
    "events_asof_orders": events_asof_orders,
    "events_range_pairs": events_range_pairs,
    "exact_dup_docs": exact_dup_docs,
    "token_counts": token_counts,
    "doc_stats": doc_stats,
    "lang_summary": lang_summary,
    "quality_scores": quality_scores,
    "repetition_stats": repetition_stats,
    "pii_redacted": pii_redacted,
    "decontaminated_docs": decontaminated_docs,
    "packed_sequences": packed_sequences,
    "minhash_signatures": minhash_signatures,
    "near_dup_pairs": near_dup_pairs,
    "cross_near_dup_pairs": cross_near_dup_pairs,
    "near_dup_clusters": near_dup_clusters,
    "near_dup_clusters_t1": near_dup_clusters_t1,
    "quality_scores_sql": quality_scores_sql,
    "source_summary": source_summary,
    "sampled_docs": sampled_docs,
    "resampled_corpus": resampled_corpus,
    "quantized_embeddings": quantized_embeddings,
    "corpus_diff": corpus_diff,
    "source_lang_rollup": source_lang_rollup,
    "events_pivot": events_pivot,
    "events_debounced": events_debounced,
    "events_running_totals": events_running_totals,
    "edit_distance_pairs": edit_distance_pairs,
    "novel_docs_incremental": novel_docs_incremental,
    "novel_docs_near_incremental": novel_docs_near_incremental,
    "top_docs_per_lang": top_docs_per_lang,
    "stratified_sample_by_lang": stratified_sample_by_lang,
    "length_quantiles_by_lang": length_quantiles_by_lang,
    "score_quantiles_by_lang": score_quantiles_by_lang,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "substring_dups": substring_dups,
    "simhash_pairs": simhash_pairs,
    "knn_cosine": knn_cosine,
    "knn_cosine_int8": knn_cosine_int8,
    "knn_cosine_lsh": knn_cosine_lsh,
    "knn_hnsw": knn_hnsw_graph,
    "knn_ivf": knn_ivf_probe,
    "knn_pq": knn_pq_adc,
    "knn_neural": knn_neural,
    "knn_neural_trained": knn_neural_trained,
    "embedding_dup_pairs": embedding_dup_pairs,
    "embedding_novelty_incremental": embedding_novelty_incremental,
}

# shared SQL-builder pieces for the hash-recomputation oracles: the
# engine's uint64 kernels (poly fold, splitmix64) reproduced in DuckDB
# HUGEINT arithmetic. 64x64 multiplies are split into 32-bit halves (a
# full product would overflow INT128).
_M64 = 1 << 64
_SQL_G, _SQL_C1, _SQL_C2 = (
    0x9E3779B97F4A7C15,
    0xBF58476D1CE4E5B9,
    0x94D049BB133111EB,
)
_SQL_POLY = 0x100000001B3


def _sql_mulmod(z: str, c: int) -> str:
    return (
        f"((((({z}) // 4294967296) * {c}) % {_M64}) * 4294967296"
        f" + (({z}) % 4294967296) * {c}) % {_M64}"
    )


def _sql_splitmix(prefix: str, src: str, incol: str, carry: str) -> str:
    """CTE chain applying splitmix64 to ``incol``; output column ``z``."""
    cc = (", " + carry) if carry else ""
    return f"""
        {prefix}1 AS (SELECT doc_id{cc}, CAST((CAST({incol} AS HUGEINT) + {_SQL_G}) % {_M64} AS UBIGINT) AS z FROM {src}),
        {prefix}2 AS (SELECT doc_id{cc}, xor(z, z >> 30) AS z FROM {prefix}1),
        {prefix}3 AS (SELECT doc_id{cc}, CAST({_sql_mulmod('CAST(z AS HUGEINT)', _SQL_C1)} AS UBIGINT) AS z FROM {prefix}2),
        {prefix}4 AS (SELECT doc_id{cc}, xor(z, z >> 27) AS z FROM {prefix}3),
        {prefix}5 AS (SELECT doc_id{cc}, CAST({_sql_mulmod('CAST(z AS HUGEINT)', _SQL_C2)} AS UBIGINT) AS z FROM {prefix}4),
        {prefix}6 AS (SELECT doc_id{cc}, xor(z, z >> 31) AS z FROM {prefix}5)"""


def _build_simhash_oracle() -> str:
    """DuckDB SQL that recomputes the engine's 64-bit SimHash bit-exactly
    and self-joins at Hamming <= 3 (r2 verdict #3).

    Every kernel step is reproduced in SQL: ASCII tokenization
    (``[^0-9a-z_]+`` split of the lowered text), per-token poly fold
    over the byte values (tokens are ASCII so ``unicode(char)`` IS the
    byte), two splitmix64 passes, frequency-weighted bit votes, sign
    pack. The 4x16-bit banding in the Ray plan is exact at Hamming <= 3
    by pigeonhole, so the all-pairs SQL is semantically equal."""
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(CFG.seed))
    M = _M64
    POLY = _SQL_POLY
    splitmix = _sql_splitmix

    return f"""
        WITH toks AS (
          SELECT d.doc_id, t.tok
          FROM documents d,
               unnest(regexp_split_to_array(lower(d.text), '[^0-9a-z_]+')) AS t(tok)
          WHERE t.tok <> ''
        ),
        folded AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, c) -> (acc * {POLY} + c) % {M}
            ) AS raw
          FROM toks
        ),
        seeded AS (SELECT doc_id, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {splitmix('s', 'seeded', 'x', '').strip()},
        uniq AS (SELECT doc_id, z AS token_hash, COUNT(*) AS cnt FROM s6 GROUP BY doc_id, z),
        {splitmix('m', 'uniq', 'token_hash', 'cnt').strip()},
        votes AS (
          SELECT doc_id, b.b,
                 SUM(CASE WHEN (z >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS v
          FROM m6, (SELECT unnest(range(64)) AS b) AS b
          GROUP BY doc_id, b.b
        ),
        packed AS (
          SELECT doc_id,
                 SUM(CASE WHEN v > 0 THEN (1::UBIGINT << b)::HUGEINT ELSE 0 END)::UBIGINT AS simhash
          FROM votes GROUP BY doc_id
        ),
        sims AS (
          SELECT d.doc_id, COALESCE(p.simhash, 0)::UBIGINT AS simhash
          FROM documents d LEFT JOIN packed p USING (doc_id)
        )
        SELECT a.doc_id AS left_id,
               b.doc_id AS right_id,
               -- bit-preserving signed view (a plain CAST range-errors
               -- at >= 2^63 instead of wrapping like the int64 view)
               CAST(CAST(a.simhash AS HUGEINT)
                    - CASE WHEN a.simhash >= {1 << 63} THEN {M}::HUGEINT
                           ELSE 0 END AS BIGINT) AS left_simhash,
               CAST(CAST(b.simhash AS HUGEINT)
                    - CASE WHEN b.simhash >= {1 << 63} THEN {M}::HUGEINT
                           ELSE 0 END AS BIGINT) AS right_simhash,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


def _build_minhash_oracle() -> str:
    """DuckDB SQL that recomputes the first four MinHash signature slots
    bit-exactly (same determinism argument as ``_build_simhash_oracle``:
    the signature is a pure function of the text bytes and the config
    seed, so SQL can replay the whole kernel chain).

    Chain replayed: ASCII tokenization with POSITION (list slicing, not
    unnest — shingles are order-dependent), token hash
    ``splitmix64(poly_fold(bytes) ^ seed_mix(0))``, k-token window fold
    (docs shorter than k fold their whole token sequence; empty docs use
    the sentinel shingle, whose per-perm signature is a constant folded
    in via COALESCE), ``splitmix64`` shingle finalizer, then per
    permutation j ``min(splitmix64(shingle ^ seed_j))``. Exposed slots
    are masked to 63 bits exactly like the Ray query."""
    import numpy as np

    from nlshray.functions.minhash import perm_seeds
    from nlshray.functions.shingles import _EMPTY_SENTINEL
    from nlshray.hashing import _seed_mix, splitmix64

    K = CFG.shingle_k
    seeds = [int(s) for s in perm_seeds(CFG.num_perms, CFG.seed)[:4]]
    seedmix = int(_seed_mix(0))  # sign_stage hashes tokens with seed=0
    mask63 = (1 << 63) - 1
    empty_sig = [
        int(splitmix64(np.array([_EMPTY_SENTINEL ^ np.uint64(s)]))[0])
        & mask63
        for s in seeds
    ]
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    sig_cols = ",\n               ".join(
        f"CAST(CAST(MIN(CASE WHEN perm = {j} THEN z END) AS HUGEINT)"
        f" % {1 << 63} AS BIGINT) AS sig_{j}"
        for j in range(4)
    )
    empty_cols = ",\n           ".join(
        f"COALESCE(p.sig_{j}, {empty_sig[j]}) AS sig_{j}" for j in range(4)
    )
    seed_values = ", ".join(
        f"({j}, {s}::UBIGINT)" for j, s in enumerate(seeds)
    )

    return f"""
        WITH tokarr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (
          SELECT doc_id, i.i AS pos, toks[i.i] AS tok
          FROM tokarr, unnest(range(1, len(toks) + 1)) AS i(i)
        ),
        folded AS (
          SELECT doc_id, pos,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, pos, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', 'pos').strip()},
        ths AS (
          SELECT doc_id, list(z ORDER BY pos) AS th, COUNT(*) AS n
          FROM t6 GROUP BY doc_id
        ),
        wins AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(th[w.w : least(w.w + {K} - 1, n)],
                               x -> CAST(x AS HUGEINT))),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM ths, unnest(range(1, greatest(n - {K} + 1, 1) + 1)) AS w(w)
        ),
        {_sql_splitmix('h', 'wins', 'raw', '').strip()},
        permed AS (
          SELECT doc_id, s.perm, xor(z, s.seed) AS x
          FROM h6, (VALUES {seed_values}) AS s(perm, seed)
        ),
        {_sql_splitmix('p', 'permed', 'x', 'perm').strip()},
        mins AS (
          SELECT doc_id,
               {sig_cols}
          FROM p6 GROUP BY doc_id
        )
        SELECT d.doc_id,
           {empty_cols}
        FROM documents d LEFT JOIN mins p USING (doc_id)
    """


def _near_dup_chain_sql(source: str = "documents") -> str:
    """Shared CTE chain for the threshold-0.8 near-dup oracles: replays
    the ENTIRE engine pipeline in DuckDB — exact-dup collapse (rep = min
    doc_id per identical text), ASCII tokenization, token poly-fold +
    splitmix, k-window shingle fold, the full 128-permutation MinHash
    signature, 16x8 LSH band keys (band fold + splitmix + band-index
    xor), candidate pairs from shared band keys, and exact shingle-set
    Jaccard. Ends with relations:

    * ``rep(doc_id, text, rep_id)`` — exact-dup map over all docs,
    * ``shset(doc_id, z)``          — per-rep sorted-unique shingle sets,
    * ``conf(left_id, right_id, jac)`` — confirmed pairs (exact J >= thr).

    Sound because at driver-check scale the engine's verify fast path
    exact-verifies EVERY candidate (``verify.py`` `_EXACT_ALL_LIMIT`),
    and no LSH bucket can exceed ``group_cap`` (=512) with <= 512 reps,
    so skew capping never alters the pair set. Same determinism argument
    as ``_build_minhash_oracle`` — every value is a pure function of the
    text bytes and the config seed."""
    import numpy as np

    from nlshray.functions.minhash import perm_seeds
    from nlshray.functions.shingles import _EMPTY_SENTINEL
    from nlshray.hashing import _seed_mix, splitmix64

    K = CFG.shingle_k
    R = CFG.rows_per_band
    seeds = [int(s) for s in perm_seeds(CFG.num_perms, CFG.seed)]
    seedmix = int(_seed_mix(0))  # sign_stage hashes tokens with seed=0
    sentinel = int(_EMPTY_SENTINEL)
    band_consts = [
        int(v) for v in splitmix64(np.arange(CFG.bands, dtype=np.uint64))
    ]
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    seed_values = ", ".join(
        f"({j}, {s}::UBIGINT)" for j, s in enumerate(seeds)
    )
    band_values = ", ".join(
        f"({b}, {c}::UBIGINT)" for b, c in enumerate(band_consts)
    )

    return f"""
        rep AS (
          SELECT doc_id, text,
                 MIN(doc_id) OVER (PARTITION BY text) AS rep_id
          FROM {source}
        ),
        reps AS (SELECT doc_id, text FROM rep WHERE doc_id = rep_id),
        tokarr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM reps
        ),
        tok AS (
          SELECT doc_id, i.i AS pos, toks[i.i] AS tok
          FROM tokarr, unnest(range(1, len(toks) + 1)) AS i(i)
        ),
        folded AS (
          SELECT doc_id, pos,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, pos, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', 'pos').strip()},
        ths AS (
          SELECT doc_id, list(z ORDER BY pos) AS th, COUNT(*) AS n
          FROM t6 GROUP BY doc_id
        ),
        wins AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(th[w.w : least(w.w + {K} - 1, n)],
                               x -> CAST(x AS HUGEINT))),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM ths, unnest(range(1, greatest(n - {K} + 1, 1) + 1)) AS w(w)
        ),
        {_sql_splitmix('h', 'wins', 'raw', '').strip()},
        shset AS (
          SELECT DISTINCT doc_id, z FROM h6
          UNION ALL
          SELECT r.doc_id, {sentinel}::UBIGINT AS z
          FROM reps r WHERE r.doc_id NOT IN (SELECT doc_id FROM ths)
        ),
        permed AS (
          SELECT doc_id, s.perm, xor(z, s.seed) AS x
          FROM shset, (VALUES {seed_values}) AS s(perm, seed)
        ),
        {_sql_splitmix('p', 'permed', 'x', 'perm').strip()},
        sigl AS (
          SELECT doc_id, list(CAST(slot AS HUGEINT) ORDER BY perm) AS sig
          FROM (SELECT doc_id, perm, MIN(z) AS slot FROM p6 GROUP BY doc_id, perm)
          GROUP BY doc_id
        ),
        bandraw AS (
          SELECT doc_id, b.b AS band,
            list_reduce(
              list_prepend(0::HUGEINT, sig[b.b * {R} + 1 : b.b * {R} + {R}]),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM sigl, (SELECT unnest(range({CFG.bands})) AS b) AS b
        ),
        {_sql_splitmix('q', 'bandraw', 'raw', 'band').strip()},
        bkey AS (
          SELECT doc_id, q6.band, xor(z, bc.c) AS key
          FROM q6 JOIN (VALUES {band_values}) AS bc(band, c) ON bc.band = q6.band
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
          FROM bkey a JOIN bkey b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        ssz AS (SELECT doc_id, COUNT(*) AS sz FROM shset GROUP BY doc_id),
        pj AS (
          SELECT c.left_id, c.right_id, COUNT(*) AS i
          FROM cand c
          JOIN shset x ON x.doc_id = c.left_id
          JOIN shset y ON y.doc_id = c.right_id AND y.z = x.z
          GROUP BY c.left_id, c.right_id
        ),
        conf AS (
          SELECT p.left_id, p.right_id,
                 (p.i * 1.0) / (a.sz + b.sz - p.i) AS jac
          FROM pj p
          JOIN ssz a ON a.doc_id = p.left_id
          JOIN ssz b ON b.doc_id = p.right_id
          WHERE (p.i * 1.0) / (a.sz + b.sz - p.i) >= {CFG.threshold}
        )"""


def _build_quality_scores_oracle() -> str:
    """Full-column oracle for ``quality_scores`` — the SQL core of
    ``quality_scores_sql`` plus the three previously rows-only columns:

    * ``n_ws_tokens``: ASCII ``\\S+`` run count,
    * ``lang_guess``: stopword-profile argmax (first-language-wins ties,
      0.02 floor — the exact scalar rule in ``detect_lang``),
    * ``fingerprint``: min ``splitmix64`` over 8-byte rolling poly folds
      of the text, zero-padded under 8 bytes (``doc_fingerprint``).

    Byte caveat: the engine folds utf-8 BYTES; this replay folds
    codepoints (``unicode(c)``), identical for ASCII corpora — which the
    driver fixture is (verified: octet_length == length for every doc).
    """
    from nlshray.functions.textstats import _LANG_STOPWORDS

    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    lang_fracs = []
    for lang, stops in _LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in sorted(stops))
        lang_fracs.append(
            f"CASE WHEN length(ts) = 0 THEN 0.0 ELSE "
            f"length(list_filter(ts, t -> list_contains([{lst}], t)))"
            f" * 1.0 / length(ts) END AS {lang}_frac"
        )
    lang_cols = ",\n            ".join(lang_fracs)
    first, second, third = list(_LANG_STOPWORDS)  # dict order = tie order

    return f"""
        WITH toks AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             x -> x != '') AS ts
          FROM documents
        ),
        feat AS (
          SELECT doc_id, text,
            length(text) AS n_chars,
            length(ts) AS n_tokens,
            length(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x != '')) AS n_ws_tokens,
            length(regexp_extract_all(text, '[0-9a-zA-Z_]+|[^0-9a-zA-Z_\\s]'))
              AS n_pieces,
            CASE WHEN length(ts) = 0 THEN 0.0
                 ELSE list_sum(list_transform(ts, t -> length(t))) / length(ts)
            END AS mean_token_len,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_extract_all(text, '[^0-9a-zA-Z_\\s]'))
                      / length(text)
            END AS punct_ratio,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_extract_all(text, '[0-9]')) / length(text)
            END AS digit_ratio,
            {lang_cols}
          FROM toks
        ),
        -- zero-pad under 8 bytes via constant-list concat + slice
        -- (list_resize growth with a column-valued size crashes duckdb 1.0)
        bl AS (
          SELECT doc_id,
                 (list_transform(
                    list_filter(regexp_split_to_array(text, ''), c -> c <> ''),
                    c -> unicode(c)::HUGEINT)
                  || [{", ".join(["0::HUGEINT"] * 8)}]
                 )[1 : greatest(length(text), 8)] AS bs
          FROM documents
        ),
        fwin AS (
          SELECT doc_id,
            list_reduce(list_prepend(0::HUGEINT, bs[w.w : w.w + 7]),
                        (acc, x) -> {fold_step}) AS raw
          FROM bl, unnest(range(1, len(bs) - 7 + 1)) AS w(w)
        ),
        {_sql_splitmix('f', 'fwin', 'raw', '').strip()},
        fp AS (
          SELECT doc_id,
                 CAST(CAST(MIN(z) AS HUGEINT) % {1 << 63} AS BIGINT)
                   AS fingerprint
          FROM f6 GROUP BY doc_id
        )
        SELECT f.doc_id, f.n_chars, f.n_tokens, f.n_ws_tokens, f.n_pieces,
               f.mean_token_len, f.punct_ratio, f.{first}_frac AS stop_ratio,
               f.digit_ratio,
               1.0
               * (CASE WHEN f.n_tokens < 20 OR f.n_tokens > 100000
                       THEN 0.3 ELSE 1.0 END)
               * (CASE WHEN f.mean_token_len < 3.0 OR f.mean_token_len > 12.0
                       THEN 0.5 ELSE 1.0 END)
               * (CASE WHEN f.punct_ratio > 0.2 THEN 0.5 ELSE 1.0 END)
               * (CASE WHEN f.digit_ratio > 0.3 THEN 0.5 ELSE 1.0 END)
               * (CASE WHEN f.{first}_frac < 0.05 THEN 0.7 ELSE 1.0 END)
               AS quality,
               CASE WHEN greatest(f.{first}_frac, f.{second}_frac,
                                  f.{third}_frac) < 0.02 THEN 'und'
                    WHEN f.{first}_frac >= f.{second}_frac
                     AND f.{first}_frac >= f.{third}_frac THEN '{first}'
                    WHEN f.{second}_frac >= f.{third}_frac THEN '{second}'
                    ELSE '{third}' END AS lang_guess,
               p.fingerprint
        FROM feat f JOIN fp p USING (doc_id)
    """


def _build_substring_dups_oracle(
    window: int = 50, winnow_w: int = 16, min_shared: int = 2
) -> str:
    """Replays the winnowed-fingerprint substring dedup in SQL:
    rolling ``window``-byte poly folds + splitmix per position, MOSS
    winnowing (first-min argmin of each ``winnow_w`` position window ==
    ``list_position(slice, list_min(slice))``), candidate pairs sharing
    a selected fingerprint (63-bit masked like ``band_hash``), confirmed
    when >= ``min_shared`` DISTINCT window hashes are shared. The
    engine's final byte-compare only rejects hash-collision false
    positives (~2^-64), so the SQL equals it on real corpora; ASCII
    caveat as in ``_build_quality_scores_oracle``."""
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    return f"""
        -- zero-pad under {window} bytes via constant-list concat + slice
        -- (list_resize growth with a column-valued size crashes duckdb 1.0)
        WITH bl AS (
          SELECT doc_id,
                 (list_transform(
                    list_filter(regexp_split_to_array(text, ''), c -> c <> ''),
                    c -> unicode(c)::HUGEINT)
                  || [{", ".join(["0::HUGEINT"] * window)}]
                 )[1 : greatest(length(text), {window})] AS bs
          FROM documents
        ),
        rwin AS (
          SELECT doc_id, w.w AS pos,
            list_reduce(list_prepend(0::HUGEINT, bs[w.w : w.w + {window - 1}]),
                        (acc, x) -> {fold_step}) AS raw
          FROM bl, unnest(range(1, len(bs) - {window - 1} + 1)) AS w(w)
        ),
        {_sql_splitmix('r', 'rwin', 'raw', 'pos').strip()},
        hl AS (
          SELECT doc_id, list(z ORDER BY pos) AS h, COUNT(*) AS n
          FROM r6 GROUP BY doc_id
        ),
        selpos AS (
          SELECT DISTINCT doc_id,
            s.s + list_position(h[s.s + 1 : least(s.s + {winnow_w}, n)],
                                list_min(h[s.s + 1 : least(s.s + {winnow_w}, n)]))
              AS pos
          FROM hl, unnest(range(0, greatest(n - {winnow_w - 1}, 1))) AS s(s)
        ),
        fps AS (
          SELECT DISTINCT sp.doc_id,
                 CAST(CAST(h[sp.pos] AS HUGEINT) % {1 << 63} AS BIGINT) AS fp
          FROM selpos sp JOIN hl USING (doc_id)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        ),
        wset AS (SELECT DISTINCT doc_id, z FROM r6),
        shared AS (
          SELECT c.left_id, c.right_id, COUNT(*) AS n_shared
          FROM cand c
          JOIN wset x ON x.doc_id = c.left_id
          JOIN wset y ON y.doc_id = c.right_id AND y.z = x.z
          GROUP BY c.left_id, c.right_id
        )
        SELECT left_id, right_id,
               n_shared AS n_shared_windows,
               CAST({window} AS BIGINT) AS match_len_checked
        FROM shared WHERE n_shared >= {min_shared}
    """


def _build_sampled_docs_oracle(fraction: float = 0.2) -> str:
    """Replays the hash-based seeded sample: keep doc iff
    ``splitmix64(doc_id ^ seed_mix(seed)) < fraction * 2^64``."""
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    thr = int(np.uint64(int(fraction * float(2**64))))
    return f"""
        WITH seeded AS (
          SELECT doc_id, n_chars,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('s', 'seeded', 'x', 'n_chars').strip()}
        SELECT doc_id, n_chars FROM s6 WHERE z < {thr}::UBIGINT
    """


def _build_stratified_oracle(fraction: float = 0.2) -> str:
    """Replays the exact-quota stratified sample: per lang, the
    ceil(frac x count) docs with the smallest splitmix64(doc_id ^ seed),
    ties on doc_id."""
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    return f"""
        WITH seeded AS (
          SELECT doc_id, lang, n_chars,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('s', 'seeded', 'x', 'lang, n_chars').strip()}
        SELECT doc_id, lang, n_chars FROM s6
        QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY z, doc_id)
                <= CEIL({fraction} * COUNT(*) OVER (PARTITION BY lang))
    """


def _build_resampled_oracle() -> str:
    """Replays the data-mix resampler: per source-index weight class,
    n_copies = floor(w) + (splitmix64(doc_id ^ seed17) < frac(w)*2^64),
    then unnest(range(n_copies)) emits one row per copy."""
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed + 17))
    base_case = " ".join(
        f"WHEN {i} THEN {int(w)}" for i, w in enumerate(_MIX_WEIGHTS)
    )
    thr_case = " ".join(
        f"WHEN {i} THEN {int(np.uint64(int((w % 1.0) * float(2**64))))}::UBIGINT"
        for i, w in enumerate(_MIX_WEIGHTS)
    )
    return f"""
        WITH seeded AS (
          SELECT doc_id, source, n_chars,
                 (CAST(SUBSTR(source, 4) AS BIGINT) % 20) % {len(_MIX_WEIGHTS)} AS widx,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('r', 'seeded', 'x', 'source, n_chars, widx').strip()},
        counts AS (
          SELECT doc_id, source, n_chars,
                 (CASE widx {base_case} END)
                 + (CASE WHEN z < (CASE widx {thr_case} END) THEN 1 ELSE 0 END)
                 AS n_copies
          FROM r6
        )
        SELECT doc_id, unnest(range(n_copies)) AS copy, source, n_chars
        FROM counts
    """


def _build_near_dup_pairs_oracle() -> str:
    """Confirmed near-dup pairs at the real threshold (0.8) — the
    flagship pipeline's pair output, bit-exact from first principles."""
    return f"""
        WITH {_near_dup_chain_sql().strip()}
        SELECT left_id, right_id, ROUND(jac, 6) AS jaccard FROM conf
    """


def _build_edit_distance_pairs_oracle() -> str:
    """The flagship pair chain composed with DuckDB ``levenshtein`` on
    the pair texts."""
    return f"""
        WITH {_near_dup_chain_sql().strip()}
        SELECT c.left_id, c.right_id,
               levenshtein(dl.text, dr.text) AS edit_distance
        FROM conf c
        JOIN documents dl ON dl.doc_id = c.left_id
        JOIN documents dr ON dr.doc_id = c.right_id
    """


def _build_novel_near_oracle() -> str:
    """Incremental near-dup novelty: seen = even-doc_id docs, new = odd.
    A new doc is NON-novel iff some seen doc shares its text group
    (exact, J=1.0) or its text group's rep has a confirmed (exact
    shingle-Jaccard >= threshold, discovered via shared LSH band)
    pair with a seen doc's text-group rep. Reuses the flagship
    kernel-replay chain; band keys and Jaccard are pure functions of
    the text, so the engine's per-side rep choice and the oracle's
    full-corpus rep choice decide identically."""
    return f"""
        WITH {_near_dup_chain_sql().strip()},
        nonnovel AS (
          SELECT DISTINCT n.doc_id
          FROM rep n JOIN rep s
            ON n.doc_id % 2 = 1 AND s.doc_id % 2 = 0
           AND s.rep_id = n.rep_id
          UNION
          SELECT DISTINCT n.doc_id
          FROM rep n, rep s, conf c
          WHERE n.doc_id % 2 = 1 AND s.doc_id % 2 = 0
            AND ((c.left_id = n.rep_id AND c.right_id = s.rep_id)
              OR (c.left_id = s.rep_id AND c.right_id = n.rep_id))
        )
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id % 2 = 1
          AND doc_id NOT IN (SELECT doc_id FROM nonnovel)
    """


def _build_cross_near_dups_oracle() -> str:
    """Decontamination join: probes = docs with doc_id % 10 = 7, corpus =
    the rest. Semantics = the flagship union chain filtered to cross-side
    pairs: exact cross dups are probe-touched text groups (J = 1.0);
    near cross pairs are confirmed rep pairs expanded through the
    exact-dup membership map with one member on each side. Band keys and
    Jaccard are pure functions of the text, so the engine's
    probe-bucket-filtered candidate generation and the oracle's full
    candidate set decide identically on every cross pair (a cross pair's
    probe-side rep is probe-touched by definition, so its bucket always
    survives the engine's broadcast filter)."""
    return f"""
        WITH {_near_dup_chain_sql().strip()},
        exact_cross AS (
          SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id, 1.0 AS jaccard
          FROM rep c JOIN rep p ON p.rep_id = c.rep_id
          WHERE c.doc_id % 10 <> 7 AND p.doc_id % 10 = 7
        ),
        cpair AS (
          SELECT left_id AS a, right_id AS b, jac FROM conf
          UNION ALL
          SELECT right_id AS a, left_id AS b, jac FROM conf
        ),
        near_cross AS (
          SELECT mc.doc_id AS corpus_id, mp.doc_id AS probe_id,
                 cp.jac AS jaccard
          FROM cpair cp
          JOIN rep mc ON mc.rep_id = cp.a AND mc.doc_id % 10 <> 7
          JOIN rep mp ON mp.rep_id = cp.b AND mp.doc_id % 10 = 7
        )
        SELECT corpus_id, probe_id, ROUND(jaccard, 6) AS jaccard
        FROM (SELECT * FROM exact_cross UNION ALL SELECT * FROM near_cross)
        ORDER BY corpus_id, probe_id
    """


def _build_near_dup_clusters_oracle() -> str:
    """Full dedup clustering at threshold 0.8: connected components over
    confirmed pairs + exact-dup edges via a recursive min-label CTE
    (label = min doc_id of the component, the engine's canonical rule —
    ``stages/cluster.py``)."""
    return f"""
        WITH RECURSIVE {_near_dup_chain_sql().strip()},
        alledge AS (
          SELECT left_id AS u, right_id AS v FROM conf
          UNION ALL
          SELECT doc_id AS u, rep_id AS v FROM rep WHERE doc_id <> rep_id
        ),
        -- MATERIALIZED: without it the recursive member re-evaluates the
        -- whole kernel-replay chain behind ``conf`` on EVERY iteration
        sym AS MATERIALIZED (
          SELECT u, v FROM alledge UNION SELECT v AS u, u AS v FROM alledge
        ),
        reach(doc_id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.doc_id
        )
        SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
    """


ORACLE_SQL = {
    "simhash_pairs": _build_simhash_oracle(),
    "minhash_signatures": _build_minhash_oracle(),
    "near_dup_pairs": _build_near_dup_pairs_oracle(),
    "cross_near_dup_pairs": _build_cross_near_dups_oracle(),
    "edit_distance_pairs": _build_edit_distance_pairs_oracle(),
    "near_dup_clusters": _build_near_dup_clusters_oracle(),
    "novel_docs_near_incremental": _build_novel_near_oracle(),
    "sampled_docs": _build_sampled_docs_oracle(),
    "resampled_corpus": _build_resampled_oracle(),
    "events_debounced": """
        WITH e AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM events
        )
        SELECT event_id, user_id, event_type, ts_us FROM e
        QUALIFY LAG(ts_us) OVER (
                  PARTITION BY user_id, event_type ORDER BY ts_us, event_id
                ) IS NULL
             OR ts_us - LAG(ts_us) OVER (
                  PARTITION BY user_id, event_type ORDER BY ts_us, event_id
                ) > 86400000000
    """,
    "events_running_totals": """
        WITH e AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                 CAST(FLOOR(value * 10000) AS BIGINT) AS v_c
          FROM events
        )
        SELECT event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
               CAST(SUM(v_c) OVER w AS BIGINT)     AS running_sum_c
        FROM e
        WINDOW w AS (
          PARTITION BY user_id ORDER BY ts_us, event_id
          ROWS UNBOUNDED PRECEDING
        )
    """,
    "events_pivot": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click')    AS n_click,
               COUNT(*) FILTER (event_type = 'error')    AS n_error,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
               COUNT(*) FILTER (event_type = 'view')     AS n_view,
               COUNT(*)                                  AS n_total
        FROM events GROUP BY user_id
    """,
    "source_lang_rollup": """
        SELECT coalesce(source, '*ALL*') AS source,
               coalesce(lang, '*ALL*')   AS lang,
               GROUPING(source) + GROUPING(lang) AS level,
               COUNT(*)                      AS n_docs,
               CAST(SUM(n_chars) AS BIGINT)  AS sum_chars
        FROM documents GROUP BY ROLLUP(source, lang)
    """,
    "corpus_diff": """
        WITH old AS (SELECT doc_id, text AS text_old FROM documents),
        new AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text_new
          FROM documents WHERE doc_id % 10 != 0
          UNION ALL
          SELECT doc_id + 1000000, text || ' v2' FROM documents WHERE doc_id % 13 = 0
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN n.text_new IS NULL THEN 'removed'
                    WHEN o.text_old IS NULL THEN 'added'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        WHERE n.text_new IS NULL OR o.text_old IS NULL OR o.text_old != n.text_new
    """,
    "quantized_embeddings": """
        WITH m AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS scale
          FROM embeddings
        )
        SELECT vec_id,
               unnest(range(len(embedding))) AS pos,
               CASE WHEN scale = 0 THEN 0 ELSE CAST(ROUND(
                 CAST(unnest(embedding) AS DOUBLE) / scale * 127, 0) AS BIGINT)
               END AS q,
               scale
        FROM m
    """,
    "stratified_sample_by_lang": _build_stratified_oracle(),
    "top_docs_per_lang": """
        SELECT doc_id, lang, n_chars FROM documents
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 3
    """,
    "length_quantiles_by_lang": """
        SELECT lang,
               quantile_disc(n_chars, 0.25) AS q_25,
               quantile_disc(n_chars, 0.50) AS q_50,
               quantile_disc(n_chars, 0.75) AS q_75,
               quantile_disc(n_chars, 0.95) AS q_95,
               quantile_disc(n_chars, 0.99) AS q_99,
               COUNT(*) AS n_rows
        FROM documents GROUP BY lang
    """,
    "quality_scores": _build_quality_scores_oracle(),
    "substring_dups": _build_substring_dups_oracle(),
    "novel_docs_incremental": """
        SELECT d.doc_id, d.n_chars
        FROM documents d
        WHERE d.doc_id % 2 = 1 AND NOT EXISTS (
          SELECT 1 FROM documents s
          WHERE s.doc_id % 2 = 0 AND s.text = d.text)
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                         AS sum_qty,
               ROUND(AVG(l_extendedprice), 4)                    AS avg_base_price,
               ROUND(AVG(l_extendedprice * (1 - l_discount)), 4) AS avg_disc_price,
               ROUND(AVG(l_quantity), 6)                         AS avg_qty,
               COUNT(*)                                          AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_customers": """
        SELECT c_name,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*)                    AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_name
        ORDER BY SUM(o_totalprice) DESC
        LIMIT 10
    """,
    "q5_region_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY n_name
    """,
    "inactive_customers": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    "orders_priority_count": """
        SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority
    """,
    "lineitem_revenue": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
        FROM lineitem WHERE l_quantity > 30.0
    """,
    "zscore_quantity": """
        SELECT l_orderkey, l_linenumber,
               ROUND((l_quantity - AVG(l_quantity) OVER ()) /
                     STDDEV_POP(l_quantity) OVER (), 6) AS z_qty
        FROM lineitem
    """,
    "events_hourly": """
        SELECT user_id,
               CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS window_hour,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY user_id, window_hour
    """,
    "events_sessionize": """
        WITH flagged AS (
          SELECT user_id, CAST(EPOCH_US(ts) AS BIGINT) AS ts_us, value,
                 CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w
                           > 30 * 60 * 1000000
                      OR LAG(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
          SELECT user_id, ts_us, value,
                 SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   ROWS UNBOUNDED PRECEDING
                 ) AS session
          FROM flagged
        )
        SELECT user_id, MIN(ts_us) AS session_start,
               COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, session
    """,
    "events_sliding": """
        SELECT event_id,
               COUNT(*)             OVER w AS cnt,
               ROUND(MAX(value) OVER w, 6) AS max_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    """,
    "events_range_pairs": """
        SELECT LEAST(e1.event_id, e2.event_id)    AS left_id,
               GREATEST(e1.event_id, e2.event_id) AS right_id
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e1.event_id < e2.event_id
         AND ABS(EPOCH_US(e1.ts) - EPOCH_US(e2.ts)) <= 600 * 1000000
    """,
    "events_asof_orders": """
        SELECT event_id, last_order_key, last_order_price FROM (
          SELECT e.event_id,
                 o.o_orderkey   AS last_order_key,
                 o.o_totalprice AS last_order_price,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC,
                                             o.o_orderkey DESC) AS rn
          FROM events e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) WHERE rn = 1
    """,
    "exact_dup_docs": """
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY text) AS keep_id,
               COUNT(*)    OVER (PARTITION BY text) AS n_copies
        FROM documents
    """,
    "token_counts": """
        SELECT doc_id,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
               END AS n_ws_tokens,
               LENGTH(REGEXP_EXTRACT_ALL(
                   text, '[0-9a-zA-Z_]+|[^0-9a-zA-Z_\\s]'
               )) AS n_pieces
        FROM documents
    """,
    "doc_stats": """
        SELECT doc_id, LENGTH(text) AS n_chars,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
               END AS n_ws_tokens
        FROM documents
    """,
    "lang_summary": """
        SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "repetition_stats": """
        WITH tokarr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (
          SELECT doc_id, u.tok FROM tokarr, unnest(toks) AS u(tok)
        ),
        per_tok AS (
          SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
        ),
        per AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_distinct_tokens,
                 CAST(max(c) AS BIGINT) AS max_token_count
          FROM per_tok GROUP BY doc_id
        ),
        big AS (
          SELECT doc_id, u.bg
          FROM (
            SELECT doc_id,
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1]) AS bgs
            FROM tokarr
          ), unnest(bgs) AS u(bg)
        ),
        per_bg AS (
          SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
        ),
        perb AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                 CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
                 CAST(max(c) AS BIGINT) AS max_bigram_count
          FROM per_bg GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.n_distinct_tokens, 0) AS n_distinct_tokens,
               round(CASE WHEN p.n_tokens > 0
                     THEN 1.0 - p.n_distinct_tokens / CAST(p.n_tokens AS DOUBLE)
                     ELSE 0.0 END, 6) AS dup_token_frac,
               round(CASE WHEN p.n_tokens > 0
                     THEN p.max_token_count / CAST(p.n_tokens AS DOUBLE)
                     ELSE 0.0 END, 6) AS top_token_frac,
               coalesce(p.max_token_count, 0) AS max_token_count,
               coalesce(b.n_bigrams, 0) AS n_bigrams,
               round(CASE WHEN b.n_bigrams > 0
                     THEN 1.0 - b.n_distinct_bigrams / CAST(b.n_bigrams AS DOUBLE)
                     ELSE 0.0 END, 6) AS dup_bigram_frac,
               round(CASE WHEN b.n_bigrams > 0
                     THEN b.max_bigram_count / CAST(b.n_bigrams AS DOUBLE)
                     ELSE 0.0 END, 6) AS top_bigram_frac
        FROM documents d
        LEFT JOIN per p USING (doc_id)
        LEFT JOIN perb b USING (doc_id)
    """,
    "ngram_jaccard_pairs": """
        WITH toks AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(text), '\\W+'), x -> x != ''
                 )) AS ts
          FROM documents
        )
        SELECT a.doc_id AS left_id, b.doc_id AS right_id,
               ROUND(CAST(length(list_intersect(a.ts, b.ts)) AS DOUBLE) /
                     (length(a.ts) + length(b.ts)
                      - length(list_intersect(a.ts, b.ts))), 6) AS jaccard
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE CAST(length(list_intersect(a.ts, b.ts)) AS DOUBLE) /
              (length(a.ts) + length(b.ts)
               - length(list_intersect(a.ts, b.ts))) >= 0.9
    """,
    "knn_cosine": """
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 5
        )
        SELECT query_id, vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])), 6) AS sim
        FROM q, embeddings
        WHERE vec_id != query_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) DESC,
                     vec_id
        ) <= 10
    """,
    "knn_cosine_int8": """
        WITH m AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS mx
          FROM embeddings
        ),
        qz AS (
          SELECT vec_id,
                 CASE WHEN mx = 0
                      THEN list_transform(embedding, x -> 0.0)
                      ELSE list_transform(embedding,
                           x -> ROUND(CAST(x AS DOUBLE) / mx * 127, 0))
                 END AS e8
          FROM m
        ),
        q AS (SELECT vec_id AS query_id, e8 AS qe FROM qz WHERE vec_id < 5)
        SELECT query_id, vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(qe, e8), 6) AS sim
        FROM q, qz
        WHERE vec_id != query_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY list_cosine_similarity(qe, e8) DESC, vec_id
        ) <= 10
    """,
    "embedding_novelty_incremental": """
        SELECT n.vec_id, n.label FROM embeddings n
        WHERE n.vec_id % 2 = 1
          AND NOT EXISTS (
            SELECT 1 FROM embeddings s
            WHERE s.vec_id % 2 = 0
              AND list_cosine_similarity(CAST(n.embedding AS DOUBLE[]),
                                         CAST(s.embedding AS DOUBLE[]))
                  >= 0.45)
    """,
    "embedding_dup_pairs": """
        SELECT a.vec_id AS left_id, b.vec_id AS right_id,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
    # The full near-dup pipeline at threshold=1.0: clusters are exactly
    # the groups of IDENTICAL shingle sets (J=1.0 is an equivalence
    # relation; identical sets collide in every band; exact verify
    # rejects J<1), so DuckDB can rebuild them from a canonical
    # shingle-set key: sorted distinct 5-token windows (short docs key on
    # their whole token sequence, empty docs share one key — mirroring
    # doc_shingle_hashes' whole-doc fold and empty sentinel).
    "near_dup_clusters_t1": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             x -> x != '') AS ts
          FROM documents
        ),
        keyed AS (
          SELECT doc_id,
                 CASE
                   WHEN length(ts) = 0 THEN chr(2) || 'EMPTY'
                   WHEN length(ts) < 5
                     THEN chr(3) || array_to_string(ts, ' ')
                   ELSE array_to_string(
                          list_sort(list_distinct(
                            list_transform(
                              generate_series(1, length(ts) - 4),
                              i -> array_to_string(ts[i:i+4], ' ')
                            )
                          )), chr(31))
                 END AS grp_key
          FROM toks
        )
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY grp_key) AS cluster_id
        FROM keyed
    """,
    "quality_scores_sql": """
        WITH toks AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             x -> x != '') AS ts
          FROM documents
        ),
        feat AS (
          SELECT doc_id,
            length(ts) AS n_tokens,
            length(regexp_extract_all(text, '[0-9a-zA-Z_]+|[^0-9a-zA-Z_\\s]'))
              AS n_pieces,
            CASE WHEN length(ts) = 0 THEN 0.0
                 ELSE list_sum(list_transform(ts, t -> length(t))) / length(ts)
            END AS mean_token_len,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_extract_all(text, '[^0-9a-zA-Z_\\s]'))
                      / length(text)
            END AS punct_ratio,
            CASE WHEN length(ts) = 0 THEN 0.0
                 ELSE length(list_filter(ts, t -> list_contains(
                   ['the','and','of','to','in','is','that','it','for','was',
                    'on','are','with','as','his','they','at','be','this',
                    'have','from','or','had','by','not','but','what','all',
                    'were','when','we','there','can'], t)))
                      / length(ts)
            END AS stop_ratio,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_extract_all(text, '[0-9]')) / length(text)
            END AS digit_ratio
          FROM toks
        )
        SELECT doc_id, n_tokens, n_pieces, mean_token_len, punct_ratio,
               stop_ratio, digit_ratio,
               1.0
               * (CASE WHEN n_tokens < 20 OR n_tokens > 100000
                       THEN 0.3 ELSE 1.0 END)
               * (CASE WHEN mean_token_len < 3.0 OR mean_token_len > 12.0
                       THEN 0.5 ELSE 1.0 END)
               * (CASE WHEN punct_ratio > 0.2 THEN 0.5 ELSE 1.0 END)
               * (CASE WHEN digit_ratio > 0.3 THEN 0.5 ELSE 1.0 END)
               * (CASE WHEN stop_ratio < 0.05 THEN 0.7 ELSE 1.0 END)
               AS quality
        FROM feat
    """,
    # substring_dups and the approximate kNN members (knn_cosine_lsh /
    # hnsw / ivf / pq / neural): recall-gated or model-defined by
    # design -> rows-only driver check.
}

# float-quantile oracle: quantile_disc over the SAME SQL-replayed score
# the quality_scores_sql oracle proves bit-exact per doc — quantile_disc
# copies an input value, so the grouped result is hash-exact too.
ORACLE_SQL["score_quantiles_by_lang"] = f"""
    WITH scored AS (
      SELECT sq.doc_id, sq.quality, d.lang
      FROM ({ORACLE_SQL["quality_scores_sql"]}) sq
      JOIN documents d USING (doc_id)
    )
    SELECT lang,
           quantile_disc(quality, 0.25) AS q_25,
           quantile_disc(quality, 0.50) AS q_50,
           quantile_disc(quality, 0.75) AS q_75,
           quantile_disc(quality, 0.90) AS q_90,
           COUNT(*) AS n_rows
    FROM scored GROUP BY lang
"""


# source_summary: integer-sum aggregates over the bit-exact per-doc
# quality/token replay; the one float column is derived post-aggregate
# with the same rounding as the engine.
ORACLE_SQL["source_summary"] = f"""
    WITH q AS ({ORACLE_SQL["quality_scores_sql"]})
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN q.quality < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_quality,
           ROUND(SUM(d.n_chars) * 1.0 / COUNT(*), 4) AS avg_chars
    FROM documents d JOIN q USING (doc_id)
    GROUP BY d.source
"""



def _build_pii_oracle() -> str:
    """Replays the sequential scrub of ``stages/clean.py`` in DuckDB —
    both engines run the identical RE2 patterns (Arrow's
    count/replace_substring_regex vs regexp_extract_all/regexp_replace),
    each pattern counted on the previous pattern's output."""
    from nlshray.stages.clean import PII_PATTERNS

    (_, p_email, r_email), (_, p_phone, r_phone), (_, p_ip, r_ip) = PII_PATTERNS
    return f"""
        WITH aug AS (
          SELECT doc_id,
                 text ||
                 CASE WHEN doc_id % 7 = 0
                      THEN ' contact user' || CAST(doc_id AS VARCHAR)
                           || '@example.com or 555-867-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END ||
                 CASE WHEN doc_id % 11 = 0
                      THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                           || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                      ELSE '' END AS t0
          FROM documents
        ),
        s1 AS (
          SELECT doc_id,
                 CAST(LENGTH(regexp_extract_all(t0, '{p_email}')) AS BIGINT)
                   AS n_email,
                 regexp_replace(t0, '{p_email}', '{r_email}', 'g') AS t1
          FROM aug
        ),
        s2 AS (
          SELECT doc_id, n_email,
                 CAST(LENGTH(regexp_extract_all(t1, '{p_phone}')) AS BIGINT)
                   AS n_phone,
                 regexp_replace(t1, '{p_phone}', '{r_phone}', 'g') AS t2
          FROM s1
        )
        SELECT doc_id, n_email, n_phone,
               CAST(LENGTH(regexp_extract_all(t2, '{p_ip}')) AS BIGINT)
                 AS n_ipv4,
               regexp_replace(t2, '{p_ip}', '{r_ip}', 'g') AS clean_text
        FROM s2
    """


ORACLE_SQL["pii_redacted"] = _build_pii_oracle()


# decontamination: the Ray plan probes 64-bit gram hashes against a
# broadcast eval set; the SQL replays it on the actual 8-token n-gram
# STRINGS (same tokenizer as repetition_stats) — a hash collision in
# the engine would fail this oracle.
ORACLE_SQL["decontaminated_docs"] = """
    WITH tokarr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id, u.g
      FROM (
        SELECT doc_id,
               list_transform(range(1, len(toks) - 6),
                              i -> array_to_string(toks[i:i+7], ' ')) AS gs
        FROM tokarr
      ), unnest(gs) AS u(g)
    ),
    dg AS (SELECT DISTINCT doc_id, g FROM grams),
    ev AS (SELECT DISTINCT g FROM dg WHERE doc_id % 50 = 8),
    ov AS (SELECT doc_id, count(*) AS n FROM dg JOIN ev USING (g)
           GROUP BY doc_id)
    SELECT d.doc_id,
           (d.doc_id % 50 = 8) AS is_eval,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
           (coalesce(o.n, 0) > 0 AND d.doc_id % 50 <> 8) AS contaminated
    FROM documents d LEFT JOIN ov o ON d.doc_id = o.doc_id
"""


# packing: one window cumsum in doc_id order replays the distributed
# chunk-prefix + within-chunk cumsum plan of stages/pack.py.
ORACLE_SQL["packed_sequences"] = """
    WITH tc AS (
      SELECT doc_id,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
             END AS n_tokens
      FROM documents
    ),
    off AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_tok
      FROM tc
    )
    SELECT doc_id, n_tokens, start_tok,
           start_tok // 512 AS first_seq,
           CASE WHEN n_tokens = 0 THEN start_tok // 512
                ELSE (start_tok + n_tokens - 1) // 512 END AS last_seq,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE (start_tok + n_tokens - 1) // 512
                     - start_tok // 512 + 1 END AS n_seqs
    FROM off
"""


def curated_corpus(sf_dir: str):
    """THE end-to-end curation pipeline a pre-training data user runs:
    PII scrub -> quality filter (>= 0.5) -> near-dup dedup at 0.8 (keep
    component reps) -> benchmark decontamination (drop eval members and
    any doc sharing an 8-gram with the eval slice) -> sequence packing.
    Every step is the engine's production stage; the DuckDB oracle
    replays the WHOLE composition (``_build_curated_oracle``).

    Scale notes: scrub+filter fuse into one streaming pass; dedup is the
    flagship plan; the rep-keep filter broadcasts sorted rep ids (8
    B/doc at driver-check scale — at 10^12 docs this becomes the
    persisted-clusters semi-join of ``stages/incremental.py``'s
    partition-check plan); decontam probes a broadcast benchmark-sized
    gram set; packing shuffles 16-byte rows only."""
    from nlshray.functions.textstats import batch_textstats
    from nlshray.stages.clean import scrub_batch
    from nlshray.stages.decontam import batch_kgram_hashes, eval_ngram_set
    from nlshray.stages.pack import pack_sequences

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub_and_filter(t: pa.Table) -> pa.Table:
        clean, _ = scrub_batch(t["text"])
        t2 = pa.table({"doc_id": t["doc_id"], "text": clean})
        f = batch_textstats(t2["text"])
        return t2.filter(pa.array(f["quality"] >= 0.5))

    filt = docs.map_batches(
        scrub_and_filter, batch_format="pyarrow", zero_copy_batch=True
    )

    res = dedup_docs(filt, CFG, num_partitions=NPARTS)
    clus = to_arrow(res.clusters)
    reps = np.sort(
        clus.filter(pc.equal(clus["doc_id"], clus["cluster_id"]))[
            "doc_id"
        ].to_numpy()
    )
    reps_ref = ray.put(reps)

    def keep_reps(t: pa.Table) -> pa.Table:
        rs = ray.get(reps_ref)
        did = t["doc_id"].to_numpy()
        if rs.size:
            idx = np.searchsorted(rs, did)
            m = (idx < rs.size) & (rs[np.minimum(idx, rs.size - 1)] == did)
        else:
            m = np.zeros(did.shape[0], bool)
        return t.filter(pa.array(m))

    survivors = filt.map_batches(
        keep_reps, batch_format="pyarrow", zero_copy_batch=True
    )

    def eval_slice(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % 50 == 8))

    ev = eval_ngram_set(
        docs.map_batches(
            eval_slice, batch_format="pyarrow", zero_copy_batch=True
        ),
        DECONTAM_K,
        seed=CFG.seed,
    )
    ev_ref = ray.put(ev)

    def drop_contaminated(t: pa.Table) -> pa.Table:
        evs = ray.get(ev_ref)
        did = t["doc_id"].to_numpy()
        flat, lens = batch_kgram_hashes(t["text"], DECONTAM_K, seed=CFG.seed)
        if evs.size and flat.size:
            idx = np.searchsorted(evs, flat)
            hit = (idx < evs.size) & (evs[np.minimum(idx, evs.size - 1)] == flat)
        else:
            hit = np.zeros(flat.shape[0], bool)
        ends = np.cumsum(lens)
        cs = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        nhit = cs[ends] - cs[ends - lens]
        keep = (nhit == 0) & (did % 50 != 8)
        return t.filter(pa.array(keep))

    cur = survivors.map_batches(
        drop_contaminated, batch_format="pyarrow", zero_copy_batch=True
    )
    return pack_sequences(cur, seq_len=512, chunk_size=128)


QUERIES["curated_corpus"] = curated_corpus


def _build_curated_oracle() -> str:
    """Replays the full curation composition in one DuckDB query:
    triple RE2 scrub -> quality replay (>= 0.5) -> the flagship
    kernel-replay near-dup chain over the FILTERED docs + recursive
    min-label components (keep reps) -> string-level 8-gram overlap
    vs the full-corpus eval slice -> the packing window cumsum."""
    from nlshray.stages.clean import PII_PATTERNS

    (_, p_email, r_email), (_, p_phone, r_phone), (_, p_ip, r_ip) = PII_PATTERNS
    qsql = ORACLE_SQL["quality_scores_sql"]
    assert qsql.count("FROM documents") == 1
    q_over_scrub = qsql.replace("FROM documents", "FROM scrub")
    chain = _near_dup_chain_sql("filt").strip()
    return f"""
        WITH RECURSIVE scrub AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(text,
                   '{p_email}', '{r_email}', 'g'),
                   '{p_phone}', '{r_phone}', 'g'),
                   '{p_ip}', '{r_ip}', 'g') AS text
          FROM documents
        ),
        qual AS ({q_over_scrub}),
        filt AS (
          SELECT s.doc_id, s.text FROM scrub s JOIN qual q USING (doc_id)
          WHERE q.quality >= 0.5
        ),
        {chain},
        alledge AS (
          SELECT left_id AS u, right_id AS v FROM conf
          UNION ALL
          SELECT doc_id AS u, rep_id AS v FROM rep WHERE doc_id <> rep_id
        ),
        sym AS MATERIALIZED (
          SELECT u, v FROM alledge UNION SELECT v AS u, u AS v FROM alledge
        ),
        reach(doc_id, r) AS (
          SELECT doc_id, doc_id FROM filt
          UNION
          SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.doc_id
        ),
        clus AS (
          SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
        ),
        surv0 AS (
          SELECT f.doc_id, f.text FROM filt f JOIN clus c USING (doc_id)
          WHERE c.doc_id = c.cluster_id
        ),
        ev_tokarr AS (
          SELECT list_filter(regexp_split_to_array(lower(text),
                   '[^0-9a-z_]+'), t -> t <> '') AS toks
          FROM documents WHERE doc_id % 50 = 8
        ),
        ev AS (
          SELECT DISTINCT u.g FROM (
            SELECT list_transform(range(1, len(toks) - 6),
                     i -> array_to_string(toks[i:i+7], ' ')) AS gs
            FROM ev_tokarr
          ), unnest(gs) AS u(g)
        ),
        s_grams AS (
          SELECT doc_id, u.g FROM (
            SELECT doc_id,
                   list_transform(range(1, len(
                     list_filter(regexp_split_to_array(lower(text),
                       '[^0-9a-z_]+'), t -> t <> '')) - 6),
                     i -> array_to_string(
                       list_filter(regexp_split_to_array(lower(text),
                         '[^0-9a-z_]+'), t -> t <> '')[i:i+7], ' ')) AS gs
            FROM surv0
          ), unnest(gs) AS u(g)
        ),
        bad AS (SELECT DISTINCT doc_id FROM s_grams JOIN ev USING (g)),
        cur AS (
          SELECT doc_id, text FROM surv0
          WHERE doc_id % 50 <> 8
            AND doc_id NOT IN (SELECT doc_id FROM bad)
        ),
        tc AS (
          SELECT doc_id,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
                 END AS n_tokens
          FROM cur
        ),
        off AS (
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS start_tok
          FROM tc
        )
        SELECT doc_id, n_tokens, start_tok,
               start_tok // 512 AS first_seq,
               CASE WHEN n_tokens = 0 THEN start_tok // 512
                    ELSE (start_tok + n_tokens - 1) // 512 END AS last_seq,
               CASE WHEN n_tokens = 0 THEN 0
                    ELSE (start_tok + n_tokens - 1) // 512
                         - start_tok // 512 + 1 END AS n_seqs
        FROM off
    """


ORACLE_SQL["curated_corpus"] = _build_curated_oracle()


def _vocab_partial(t: pa.Table, col: str = "tok") -> pa.Table:
    """One block's token value_counts partial: (col, n) rows."""
    from nlshray.functions.shingles import _SPLIT_PATTERN

    arr = t["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    vc = pc.value_counts(flat)
    return pa.table(
        {
            col: vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


def vocab_top_tokens(sf_dir: str, k: int = 100):
    """Corpus-wide token vocabulary: top-k tokens by total count
    (deterministic tiebreak: count DESC, token ASC) — the tokenizer-
    training prep op. Combiner-style: each block pre-counts its tokens
    in Arrow's C++ ``value_counts`` kernel, so the groupby shuffles at
    most (blocks x block-vocab) rows, never one row per token
    occurrence. Hash exchange (`stages/exchange.py`) + per-shard
    top-k inside the merge round (each shard holds COMPLETE global
    counts for its keys, so shard-local top-k is exact); only P x k
    rows reach the final sort."""
    from functools import partial as fpartial

    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        utf8_key_hash,
    )

    docs = _pq(sf_dir, "documents", columns=["text"])
    refs = docs.to_arrow_refs()
    if not refs:
        return rd.from_arrow(
            pa.table({"tok": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        )
    base = grouped_sum_merge("tok", ["n"])

    def merge_topk(t: pa.Table) -> pa.Table:
        out = base(t)
        if len(out) > k:
            order = pc.sort_indices(
                out, sort_keys=[("n", "descending"), ("tok", "ascending")]
            )
            out = out.take(order[:k])
        return out

    shards = rd.from_arrow_refs(
        hash_exchange(
            refs,
            fpartial(_vocab_partial, col="tok"),
            utf8_key_hash("tok"),
            merge_topk,
            NPARTS,
        )
    )
    return shards.sort(["n", "tok"], descending=[True, False]).limit(k)


QUERIES["vocab_top_tokens"] = vocab_top_tokens

ORACLE_SQL["vocab_top_tokens"] = """
    WITH tok AS (
      SELECT u.tok FROM (
        SELECT list_filter(regexp_split_to_array(lower(text),
                 '[^0-9a-z_]+'), t -> t <> '') AS toks
        FROM documents
      ), unnest(toks) AS u(tok)
    ),
    cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok)
    SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT 100
"""


def heavy_hitter_tokens(sf_dir: str, threshold: int = 100):
    """Threshold heavy hitters (``stages/heavy.heavy_hitter_tokens``):
    every token with exact corpus count >= threshold, found by a
    CountMin-sketch candidate pass (broadcast once via ``ray.put``) in
    front of an exact second pass — the sketch prunes, never answers,
    so the output is exact and SQL-replayable while the merge shuffle
    is bounded by the d*w sketch cells instead of the open-vocabulary
    tail a top-k combiner must move."""
    from nlshray.stages.heavy import heavy_hitter_tokens as _hh

    docs = _pq(sf_dir, "documents", columns=["text"])
    return _hh(
        docs, threshold=threshold, seed=CFG.seed, num_partitions=NPARTS
    )


QUERIES["heavy_hitter_tokens"] = heavy_hitter_tokens

ORACLE_SQL["heavy_hitter_tokens"] = """
    WITH tok AS (
      SELECT u.tok FROM (
        SELECT list_filter(regexp_split_to_array(lower(text),
                 '[^0-9a-z_]+'), t -> t <> '') AS toks
        FROM documents
      ), unnest(toks) AS u(tok)
    ),
    cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok)
    SELECT tok, n FROM cnt WHERE n >= 100 ORDER BY n DESC, tok
"""


def capped_docs_per_source(sf_dir: str, cap: int = 15):
    """Per-provenance quota sampling (``stages/topk.capped_sample``): at
    most ``cap`` docs per source, chosen by splitmix64(doc_id ^ seed)
    rank — deterministic, one-pass, parallelism-independent."""
    from nlshray.stages.topk import capped_sample

    docs = _pq(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return capped_sample(docs, "source", cap, seed=CFG.seed)


QUERIES["capped_docs_per_source"] = capped_docs_per_source


def _build_capped_oracle(cap: int = 15) -> str:
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    return f"""
        WITH seeded AS (
          SELECT doc_id, source, n_chars,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('s', 'seeded', 'x', 'source, n_chars').strip()}
        SELECT doc_id, source, n_chars FROM s6
        QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY z, doc_id)
                <= {cap}
    """


ORACLE_SQL["capped_docs_per_source"] = _build_capped_oracle()


def events_props_typed(sf_dir: str):
    """Semi-structured extraction: pull the typed scalar ``k`` out of
    the JSON ``events.props`` column (``stages/jsoncol.py`` — one
    vectorized RE2 pass per field, json.loads only on rows with
    escapes/nesting). Full-column output so the oracle checks every
    extracted value, not an aggregate of them."""
    from nlshray.stages.jsoncol import json_fields_stage

    ev = _pq(sf_dir, "events", columns=["event_id", "event_type", "props"])
    return json_fields_stage(ev, "props", {"k": "int64"})


QUERIES["events_props_typed"] = events_props_typed

ORACLE_SQL["events_props_typed"] = """
    SELECT event_id, event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
"""


def lineitem_correlations(sf_dir: str):
    """Pairwise covariance/correlation of the lineitem value columns per
    return flag (``stages/stats.grouped_covariance``): one vectorized
    raw-moment partial pass per block, one tiny driver combine, zero
    shuffles — the corpus-statistics member of the A3/A4 family."""
    from nlshray.stages.stats import grouped_covariance

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _pq(sf_dir, "lineitem", columns=["l_returnflag"] + cols)
    out = grouped_covariance(ds, by="l_returnflag", cols=cols)
    return _round(out, {"cov_pop": 4, "corr": 6})


QUERIES["lineitem_correlations"] = lineitem_correlations


def _build_corr_oracle() -> str:
    from itertools import combinations

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    parts = [
        f"""
        SELECT l_returnflag, '{a}' AS var_x, '{b}' AS var_y,
               COUNT(*) AS n,
               ROUND(COVAR_POP({a}, {b}), 4) AS cov_pop,
               ROUND(CORR({a}, {b}), 6) AS corr
        FROM lineitem GROUP BY l_returnflag
        """
        for a, b in combinations(cols, 2)
    ]
    return " UNION ALL ".join(parts)


ORACLE_SQL["lineitem_correlations"] = _build_corr_oracle()


def distinct_tokens_hll(sf_dir: str):
    """HyperLogLog sketch of the corpus's distinct-token set
    (``stages/stats.hll_distinct`` over the same tokenize+hash chain
    the signer uses). Output is the SKETCH itself — every nonzero
    (register, rho) pair — so the oracle bit-exactly checks the whole
    tokenize -> hash -> route -> rank -> max pipeline, not a float
    estimate."""
    from nlshray.functions.shingles import _SPLIT_PATTERN
    from nlshray.hashing import hash_utf8_array
    from nlshray.stages.stats import hll_distinct

    docs = _pq(sf_dir, "documents", columns=["text"])

    def hashes(t: pa.Table) -> np.ndarray:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return hash_utf8_array(flat, seed=0)

    regs = hll_distinct(docs, hashes)
    nz = np.flatnonzero(regs)
    return pa.table(
        {
            "register": pa.array(nz.astype(np.int64)),
            "rho": pa.array(regs[nz].astype(np.int64)),
        }
    )


QUERIES["distinct_tokens_hll"] = distinct_tokens_hll


def source_similarity(sf_dir: str):
    """Pairwise vocabulary overlap between corpus sources: exact Jaccard
    of each source pair's distinct-token-hash sets — the corpus-level
    'which feeds are near-mirrors of each other' diagnostic that decides
    source-level dedup priorities.

    Scale plan (no token-keyed groupby — near-unique keys are
    pathological, see BASELINE.md): per block, a partial pass ORs each
    token's source-bit into a bitmask and dedups (token_hash, mask)
    locally; ONE shuffle on ``token_hash % NPARTS`` (a tiny fixed key
    space) OR-merges the masks per token and collapses each partition to
    a (mask, n_tokens) histogram — at most 2^n_sources rows, in practice
    a handful. Pair intersections fall out of the histogram with one
    small matmul on the driver; per-pair output is integer-exact
    (``jaccard_ppm = n_common * 1e6 // n_union``)."""
    from nlshray.functions.shingles import _SPLIT_PATTERN
    from nlshray.hashing import hash_utf8_array

    docs = _pq(sf_dir, "documents", columns=["source", "text"])

    src_parts = docs.map_batches(
        lambda t: pa.table({"source": pc.unique(t["source"])}),
        batch_format="pyarrow",
    ).take_all()
    sources = sorted({r["source"] for r in src_parts})
    n_src = len(sources)
    if n_src > 63:
        raise ValueError("source_similarity supports up to 63 sources")
    source_arr = pa.array(sources)

    def partial(t: pa.Table) -> dict[str, np.ndarray]:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(text), _SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        flat = toks.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        hashes = hash_utf8_array(flat.filter(pa.array(keep)), seed=0)
        bits = pc.index_in(t["source"], source_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        masks = np.int64(1) << bits[doc_idx[keep]]
        order = np.argsort(hashes, kind="stable")
        h, m = hashes[order], masks[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(h)) + 1])
        merged = np.bitwise_or.reduceat(m, starts)
        hu = h[starts]
        return {
            "part": (hu % np.uint64(NPARTS)).astype(np.int64),
            "token_hash": hu.view(np.int64),
            "mask": merged,
        }

    def histogram(t: pa.Table) -> dict[str, np.ndarray]:
        h = t["token_hash"].to_numpy(zero_copy_only=False)
        m = t["mask"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, m = h[order], m[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(h)) + 1])
        merged = np.bitwise_or.reduceat(m, starts)
        masks, counts = np.unique(merged, return_counts=True)
        return {"mask": masks, "n_tokens": counts.astype(np.int64)}

    hist = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part", num_partitions=NPARTS)
        .map_groups(histogram, batch_format="pyarrow")
    )
    tbl = to_arrow(hist)
    masks = tbl["mask"].to_numpy(zero_copy_only=False)
    counts = tbl["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    bits = ((masks[:, None] >> np.arange(n_src, dtype=np.int64)) & 1).astype(
        np.int64
    )
    inter = (bits * counts[:, None]).T @ bits  # (n_src, n_src)
    sizes = counts @ bits  # (n_src,)

    ia, ib, nc, nu, ppm, sa, sb = [], [], [], [], [], [], []
    for i in range(n_src):
        for j in range(i + 1, n_src):
            c = int(inter[i, j])
            u = int(sizes[i] + sizes[j] - c)
            sa.append(sources[i])
            sb.append(sources[j])
            nc.append(c)
            nu.append(u)
            ppm.append(c * 1_000_000 // u if u else 0)
    return pa.table(
        {
            "source_a": pa.array(sa),
            "source_b": pa.array(sb),
            "n_common": pa.array(nc, pa.int64()),
            "n_union": pa.array(nu, pa.int64()),
            "jaccard_ppm": pa.array(ppm, pa.int64()),
        }
    )


QUERIES["source_similarity"] = source_similarity


def _build_source_similarity_oracle() -> str:
    """Replays the token-hash chain (same CTEs as the HLL oracle) per
    (source, token), distincts the hash sets, and derives pairwise
    intersection/union with a self-join; jaccard_ppm uses integer
    division so every compared column is integer-exact."""
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(0))
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    return f"""
        WITH tokarr AS (
          SELECT doc_id, source,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (
          SELECT DISTINCT source, u.tok
          FROM tokarr, unnest(toks) AS u(tok)
        ),
        folded AS (
          SELECT 0::BIGINT AS doc_id, source,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, source, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', 'source').strip()},
        sh AS (SELECT DISTINCT source, z FROM t6),
        sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        inter AS (
          SELECT a.source AS sa, b.source AS sb, COUNT(*) AS nc
          FROM sh a JOIN sh b ON a.z = b.z AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT p.sa AS source_a, p.sb AS source_b,
               COALESCE(i.nc, 0) AS n_common,
               p.na + p.nb - COALESCE(i.nc, 0) AS n_union,
               CASE WHEN p.na + p.nb - COALESCE(i.nc, 0) = 0 THEN 0
                    ELSE COALESCE(i.nc, 0) * 1000000
                         // (p.na + p.nb - COALESCE(i.nc, 0))
               END AS jaccard_ppm
        FROM (
          SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
          FROM sizes a JOIN sizes b ON a.source < b.source
        ) p
        LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    """


ORACLE_SQL["source_similarity"] = _build_source_similarity_oracle()


def distinct_tokens_by_lang_hll(sf_dir: str):
    """GROUPED HyperLogLog: one distinct-token sketch PER LANGUAGE —
    sketches as mergeable per-key aggregates (the per-domain distinct
    count you'd run at 100 TB). Unlike the global ``distinct_tokens_hll``
    (driver max-merge of one 16 KiB partial per block), the grouped
    variant merges INSIDE the shuffle: each block emits one register
    partial per language it saw, and a ``groupby(lang).map_groups``
    max-merges them — the driver never touches a register. Output is
    every nonzero (lang, register, rho) — the whole sketch, bit-exact
    against the SQL replay of tokenize -> hash -> route -> rank -> max.
    """
    from nlshray.functions.hll import M, hll_partial
    from nlshray.functions.shingles import _SPLIT_PATTERN
    from nlshray.hashing import hash_utf8_array

    docs = _pq(sf_dir, "documents", columns=["text", "lang"])

    def partials(t: pa.Table):
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per_doc = pc.list_value_length(toks).to_numpy()
        flat = toks.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        hashes = hash_utf8_array(flat.filter(keep), seed=0)
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        tok_lang = np.repeat(langs, n_per_doc)[keep.to_numpy(zero_copy_only=False)]
        out_lang, out_regs = [], []
        for lang in np.unique(tok_lang):
            regs = hll_partial(
                np.ascontiguousarray(hashes[tok_lang == lang], np.uint64)
            )
            out_lang.append(lang)
            out_regs.append(regs.tobytes())
        return {
            "lang": np.array(out_lang, dtype=object),
            "regs": np.array(out_regs, dtype=object),
        }

    def merge_group(t: pa.Table) -> pa.Table:
        merged = np.zeros(M, np.uint8)
        for raw in t["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(raw, np.uint8), out=merged)
        nz = np.flatnonzero(merged)
        lang = t["lang"][0].as_py()
        return pa.table(
            {
                "lang": pa.array([lang] * len(nz)),
                "register": pa.array(nz.astype(np.int64)),
                "rho": pa.array(merged[nz].astype(np.int64)),
            }
        )

    return (
        docs.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang", num_partitions=NPARTS)
        .map_groups(merge_group, batch_format="pyarrow")
    )


QUERIES["distinct_tokens_by_lang_hll"] = distinct_tokens_by_lang_hll


def _build_hll_oracle() -> str:
    """Replays tokenization, the token hash (same chain as the minhash
    oracle) and the HLL register routing/rank in SQL: register = top 14
    hash bits, rho = leading-zero run of the remaining 50 bits + 1
    (bit length via length(bin(x)) — DuckDB bin() has no leading
    zeros), registers take the max rho."""
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(0))
    low50 = (1 << 50) - 1
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    return f"""
        WITH tokarr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, u.tok FROM tokarr, unnest(toks) AS u(tok)),
        folded AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', '').strip()},
        hl AS (
          SELECT CAST(z >> 50 AS BIGINT) AS register,
                 CAST(CASE WHEN (z & {low50}::UBIGINT) = 0::UBIGINT THEN 51
                      ELSE 50 - length(bin(z & {low50}::UBIGINT)) + 1
                      END AS BIGINT) AS rho
          FROM t6
        )
        SELECT register, MAX(rho) AS rho FROM hl GROUP BY register
    """


ORACLE_SQL["distinct_tokens_hll"] = _build_hll_oracle()


def _build_hll_by_lang_oracle() -> str:
    """The ``_build_hll_oracle`` chain with ``lang`` carried through
    every CTE and the final register max grouped by (lang, register)."""
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(0))
    low50 = (1 << 50) - 1
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    return f"""
        WITH tokarr AS (
          SELECT doc_id, lang,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, lang, u.tok FROM tokarr, unnest(toks) AS u(tok)),
        folded AS (
          SELECT doc_id, lang,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, lang,
                          xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x
                   FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', 'lang').strip()},
        hl AS (
          SELECT lang,
                 CAST(z >> 50 AS BIGINT) AS register,
                 CAST(CASE WHEN (z & {low50}::UBIGINT) = 0::UBIGINT THEN 51
                      ELSE 50 - length(bin(z & {low50}::UBIGINT)) + 1
                      END AS BIGINT) AS rho
          FROM t6
        )
        SELECT lang, register, MAX(rho) AS rho FROM hl GROUP BY lang, register
    """


ORACLE_SQL["distinct_tokens_by_lang_hll"] = _build_hll_by_lang_oracle()


def doc_keywords_tfidf(sf_dir: str, k: int = 3):
    """Top-k keywords per doc by smoothed tf-idf
    (``stages/tfidf.py``): df pass = per-block distinct-doc combiner
    partials + one vocab-sized groupby; scoring pass = broadcast df
    lookup, per-doc top-k under (rounded score DESC, token ASC)."""
    from nlshray.stages.tfidf import tfidf_topk

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(docs, k=k, num_partitions=NPARTS)


QUERIES["doc_keywords_tfidf"] = doc_keywords_tfidf

ORACLE_SQL["doc_keywords_tfidf"] = """
    WITH tokarr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, u.tok FROM tokarr, unnest(toks) AS u(tok)),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf,
             ROUND(tf.tf * (ln((CAST(n.n AS DOUBLE) + 1)
                               / (CAST(df.df AS DOUBLE) + 1)) + 1), 6)
               AS score
      FROM tf JOIN df USING (tok), n
    )
    SELECT doc_id, tok, tf, score FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, tok) <= 3
"""


def epoch_shuffled_order(sf_dir: str, seed: int | None = None):
    """Seeded epoch shuffle (T3 at corpus scale,
    ``stages/shuffle.py``): the corpus's deterministic global training
    order for one epoch — rank attached by driver-stitched block
    offsets over the hash-sorted Dataset."""
    from nlshray.stages.shuffle import epoch_shuffle_rank

    docs = _pq(sf_dir, "documents", columns=["doc_id"])
    return epoch_shuffle_rank(
        docs, id_col="doc_id", seed=CFG.seed if seed is None else seed
    )


QUERIES["epoch_shuffled_order"] = epoch_shuffled_order


def _build_epoch_shuffle_oracle() -> str:
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    mask63 = (1 << 63) - 1
    return f"""
        WITH seeded AS (
          SELECT doc_id, xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('s', 'seeded', 'x', '').strip()}
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY z & {mask63}::UBIGINT, doc_id) - 1 AS BIGINT)
                 AS epoch_rank
        FROM s6
    """


ORACLE_SQL["epoch_shuffled_order"] = _build_epoch_shuffle_oracle()


def embedding_covariance(sf_dir: str):
    """Pairwise population covariance of the embedding dimensions
    (``stages/stats.embedding_moments``: per-block (n, Σx, XᵀX)
    partials, one driver merge — the PCA input, SQL-checked as the
    full upper-triangle matrix)."""
    from nlshray.stages.stats import embedding_moments

    ds = _pq(sf_dir, "embeddings", columns=["embedding"])
    n, mean, cov = embedding_moments(ds)
    d = cov.shape[0]
    ii, jj = np.triu_indices(d)
    return _round(
        pa.table(
            {
                "dim_i": pa.array(ii.astype(np.int64)),
                "dim_j": pa.array(jj.astype(np.int64)),
                "n": pa.array(np.full(ii.shape[0], n, np.int64)),
                "cov_pop": pa.array(cov[ii, jj], pa.float64()),
            }
        ),
        {"cov_pop": 6},
    )


QUERIES["embedding_covariance"] = embedding_covariance

ORACLE_SQL["embedding_covariance"] = """
    WITH flat AS (
      SELECT vec_id, i.i - 1 AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)
    )
    SELECT a.dim AS dim_i, b.dim AS dim_j,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COVAR_POP(a.x, b.x), 6) AS cov_pop
    FROM flat a JOIN flat b
      ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY a.dim, b.dim
"""


def duplicate_spans(sf_dir: str, k: int = 8):
    """Intra-corpus duplicate-span report (C4-style hygiene,
    ``stages/decontam.duplicate_span_stats``): per doc, distinct
    k-token spans and how many also occur in another doc. Integer-only
    output — the oracle replays token-hash -> window-fold -> distinct
    -> cross-doc counts with no float rounding anywhere."""
    from nlshray.stages.decontam import duplicate_span_stats

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_span_stats(docs, k=k, num_partitions=NPARTS)


QUERIES["duplicate_spans"] = duplicate_spans


def _build_dup_span_oracle(k: int = 8) -> str:
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(0))
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    return f"""
        WITH tokarr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (
          SELECT doc_id, i.i AS pos, toks[i.i] AS tok
          FROM tokarr, unnest(range(1, len(toks) + 1)) AS i(i)
        ),
        folded AS (
          SELECT doc_id, pos,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, pos, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', 'pos').strip()},
        ths AS (
          SELECT doc_id, list(z ORDER BY pos) AS th, COUNT(*) AS n
          FROM t6 GROUP BY doc_id
        ),
        wins AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(th[w.w : w.w + {k} - 1],
                               x -> CAST(x AS HUGEINT))),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM ths, unnest(range(1, greatest(n - {k} + 1, 0) + 1)) AS w(w)
        ),
        {_sql_splitmix('h', 'wins', 'raw', '').strip()},
        grams AS (SELECT DISTINCT doc_id, z FROM h6),
        gd AS (SELECT z, COUNT(*) AS nd FROM grams GROUP BY z),
        per AS (
          SELECT g.doc_id, COUNT(*) AS n_spans,
                 SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
          FROM grams g JOIN gd USING (z) GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


ORACLE_SQL["duplicate_spans"] = _build_dup_span_oracle()


def dataset_splits(sf_dir: str):
    """Deterministic train/valid/test assignment
    (``stages/topk.assign_splits``): split = hash-threshold of
    splitmix64(doc_id ^ seed) — stable under reruns, resume, corpus
    growth, and any parallelism. Full-column output."""
    from nlshray.stages.topk import assign_splits

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang"])
    return assign_splits(docs, "doc_id", seed=CFG.seed)


QUERIES["dataset_splits"] = dataset_splits


def _build_splits_oracle() -> str:
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    t1 = int(0.8 * float(2**64))
    t2 = int(0.9 * float(2**64))
    return f"""
        WITH seeded AS (
          SELECT doc_id, lang,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('s', 'seeded', 'x', 'lang').strip()}
        SELECT doc_id, lang,
               CASE WHEN z < {t1}::UBIGINT THEN 'train'
                    WHEN z < {t2}::UBIGINT THEN 'valid'
                    ELSE 'test' END AS split
        FROM s6
    """


ORACLE_SQL["dataset_splits"] = _build_splits_oracle()


def source_dup_rates(sf_dir: str):
    """Per-provenance near-dup report: for each source, how many docs
    it contributes and how many of those sit in a non-singleton
    cluster of the flagship threshold-0.8 dedup — the 'which crawl is
    polluting my corpus' question, as one composition (dedup ->
    cluster sizes -> broadcast dup-id membership -> per-source
    combiner groupby). Integer-only output; the oracle replays the
    whole chain and aggregates the recursive-CTE clusters. Scale note:
    cluster sizes here come from the materialized clusters table (the
    driver-check contract); at 10^9+ docs compute sizes with a
    groupby-count on the clusters Dataset and keep only the dup ids —
    the broadcast side is the dup subset, not the corpus."""
    from nlshray.functions.nputil import isin_sorted

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    res = dedup_docs(docs, CFG, num_partitions=NPARTS)
    clus = to_arrow(res.clusters)
    cid = clus["cluster_id"].to_numpy()
    ids = clus["doc_id"].to_numpy()
    _u, inv, cnt = np.unique(cid, return_inverse=True, return_counts=True)
    dup_ref = ray.put(np.sort(ids[cnt[inv] >= 2]))

    def partial(t: pa.Table) -> pa.Table:
        dup_ids = ray.get(dup_ref)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        g = len(enc.dictionary)
        hit = isin_sorted(dup_ids, t["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "source": enc.dictionary,
                "n_docs": pa.array(np.bincount(codes, minlength=g).astype(np.int64)),
                "n_dup_docs": pa.array(
                    np.bincount(codes[hit], minlength=g).astype(np.int64)
                ),
            }
        )

    src = _pq(sf_dir, "documents", columns=["doc_id", "source"])
    agg = (
        src.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source", num_partitions=NPARTS)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_dup_docs", alias_name="n_dup_docs"),
        )
    )
    return to_arrow(agg)


QUERIES["source_dup_rates"] = source_dup_rates


def _build_source_dup_oracle() -> str:
    return f"""
        WITH RECURSIVE {_near_dup_chain_sql().strip()},
        alledge AS (
          SELECT left_id AS u, right_id AS v FROM conf
          UNION ALL
          SELECT doc_id AS u, rep_id AS v FROM rep WHERE doc_id <> rep_id
        ),
        sym AS MATERIALIZED (
          SELECT u, v FROM alledge UNION SELECT v AS u, u AS v FROM alledge
        ),
        reach(doc_id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.doc_id
        ),
        clus AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
        sz AS (SELECT cluster_id, COUNT(*) AS sz FROM clus GROUP BY cluster_id)
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN sz.sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_docs
        FROM documents d
        JOIN clus USING (doc_id) JOIN sz USING (cluster_id)
        GROUP BY d.source
    """


ORACLE_SQL["source_dup_rates"] = _build_source_dup_oracle()


def lang_mismatches(sf_dir: str):
    """Label-vs-content language audit: docs whose declared ``lang``
    disagrees with the stopword-profile language-ID
    (``functions/textstats.detect_lang`` — the exact rule the quality
    oracle replays). The 'mislabeled corpus slice' hygiene query; one
    streaming pass, no shuffle."""
    from nlshray.functions.textstats import batch_textstats

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def fn(t: pa.Table) -> pa.Table:
        guess = pa.array(
            batch_textstats(t["text"], with_fingerprint=False)[
                "lang_guess"
            ].tolist(),
            pa.string(),
        )
        out = pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "lang_guess": guess}
        )
        return out.filter(pc.invert(pc.equal(out["lang"], guess)))

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["lang_mismatches"] = lang_mismatches


def _build_lang_mismatch_oracle() -> str:
    from nlshray.functions.textstats import _LANG_STOPWORDS

    lang_fracs = []
    for lang, stops in _LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in sorted(stops))
        lang_fracs.append(
            f"CASE WHEN length(ts) = 0 THEN 0.0 ELSE "
            f"length(list_filter(ts, t -> list_contains([{lst}], t)))"
            f" * 1.0 / length(ts) END AS {lang}_frac"
        )
    lang_cols = ",\n            ".join(lang_fracs)
    first, second, third = list(_LANG_STOPWORDS)
    return f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             x -> x != '') AS ts
          FROM documents
        ),
        feat AS (SELECT doc_id, lang, {lang_cols} FROM toks),
        guessed AS (
          SELECT doc_id, lang,
               CASE WHEN greatest({first}_frac, {second}_frac,
                                  {third}_frac) < 0.02 THEN 'und'
                    WHEN {first}_frac >= {second}_frac
                     AND {first}_frac >= {third}_frac THEN '{first}'
                    WHEN {second}_frac >= {third}_frac THEN '{second}'
                    ELSE '{third}' END AS lang_guess
          FROM feat
        )
        SELECT doc_id, lang, lang_guess FROM guessed
        WHERE lang <> lang_guess
    """


ORACLE_SQL["lang_mismatches"] = _build_lang_mismatch_oracle()


def quality_filtered_docs(sf_dir: str, q: float = 0.25):
    """Dynamic per-language quality gate: keep docs whose quality score
    reaches their language's own P25 (quantile_disc) — thresholds
    derived from the data, not hand-set, so a weak language's docs
    aren't mass-dropped by a global cutoff. Composition: one scoring
    pass keeping (doc_id, lang, quality), materialized in the OBJECT
    STORE (three slim columns, never the driver); per-lang exact float
    quantile via the histogram+refine combiner
    (``grouped_quantiles_float`` — zero shuffles); thresholds (5
    floats) broadcast into a filter pass over the same materialized
    dataset. Exactness: quality floats are bit-identical in engine and
    oracle (quality_scores hash-matches) and quantile_disc picks an
    actual data value, so the >= compare is exact on both sides."""
    from nlshray.functions.textstats import batch_textstats
    from nlshray.stages.quantiles import grouped_quantiles_float

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def score(t: pa.Table) -> pa.Table:
        f = batch_textstats(t["text"], with_fingerprint=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "quality": pa.array(f["quality"], pa.float64()),
            }
        )

    scored = docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    pct = int(round(q * 100))
    qt = grouped_quantiles_float(scored, "lang", "quality", [q])
    cuts = dict(
        zip(qt["lang"].to_pylist(), qt[f"q_{pct}"].to_pylist())
    )
    cut_ref = ray.put(cuts)

    def keep(t: pa.Table) -> pa.Table:
        c = ray.get(cut_ref)
        lang = t["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        per_lang = np.array([c[g] for g in enc.dictionary.to_pylist()])
        thr = per_lang[np.asarray(enc.indices, np.int64)]
        return t.filter(pa.array(t["quality"].to_numpy() >= thr))

    return scored.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


QUERIES["quality_filtered_docs"] = quality_filtered_docs


def _build_quality_filter_oracle(q: float = 0.25) -> str:
    """Per-lang quantile_disc threshold + filter over the SQL quality
    replay (the `qual` CTE is `_build_quality_scores_oracle`'s
    composition re-used via quality_scores' own oracle as a subquery)."""
    inner = _build_quality_scores_oracle().strip()
    return f"""
        WITH qual AS ({inner}),
        lab AS (
          SELECT q.doc_id, d.lang, q.quality
          FROM qual q JOIN documents d USING (doc_id)
        ),
        cut AS (
          SELECT lang, quantile_disc(quality, {q}) AS thr
          FROM lab GROUP BY lang
        )
        SELECT l.doc_id, l.lang, l.quality
        FROM lab l JOIN cut USING (lang)
        WHERE l.quality >= cut.thr
    """


ORACLE_SQL["quality_filtered_docs"] = _build_quality_filter_oracle()


def chunked_docs(sf_dir: str, size: int = 200, overlap: int = 50):
    """Overlapping fixed-size chunking (``stages/chunk.py`` — the
    embedding/RAG prep op): one fancy-index gather over each block's
    concatenated utf-8 buffer, no per-row Python. Rule replayed by the
    oracle: step = size - overlap, chunk i = text[i*step : i*step+size],
    n = ceil(max(len,1)/step)."""
    from nlshray.stages.chunk import chunk_docs

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_docs(docs, size=size, overlap=overlap)


QUERIES["chunked_docs"] = chunked_docs

ORACLE_SQL["chunked_docs"] = """
    WITH n AS (SELECT doc_id, text, length(text) AS L FROM documents)
    SELECT doc_id, i.i AS chunk_idx,
           substring(text, CAST(i.i * 150 + 1 AS BIGINT), 200) AS chunk_text
    FROM n, unnest(range(0, CAST(ceil(greatest(L, 1) / 150.0) AS BIGINT)))
           AS i(i)
"""


def band_stats(sf_dir: str):
    """LSH band-collision diagnostics (the skew/tuning report for the
    flagship's candidate-generation shuffle): per band, how many docs
    emitted keys, how many distinct buckets exist, the largest bucket,
    and the implied candidate-pair fan-out sum(c*(c-1)/2). This is the
    table an operator reads before choosing ``group_cap``/salting at
    100 TB — hot buckets show up here before they hurt the shuffle.

    Plan: exact-dup collapse -> sign -> band rows (18 B/row, the same
    thing the pair shuffle moves) -> per-block partial (band, key)
    counts -> one key-grouped sum -> a 16-row per-band fold. Integer
    only; the oracle replays the full tokenize -> shingle -> MinHash ->
    band-fold chain (``_near_dup_chain_sql``) down to ``bkey`` and
    aggregates the same four statistics."""
    from nlshray.stages.band import band_stage

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    reps = exact_stage(docs, num_partitions=NPARTS)

    def only_reps(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["doc_id"], t["rep_id"])
        return t.filter(keep).select(["doc_id", "text"])

    reps = reps.map_batches(only_reps, batch_format="pyarrow", zero_copy_batch=True)
    rows = band_stage(sign_stage(reps, CFG), CFG)

    from nlshray.stages.exchange import hash_exchange, int64_key_hash

    refs = rows.to_arrow_refs()
    shard_tables = (
        [
            s
            for s in ray.get(
                hash_exchange(
                    refs,
                    _band_bucket_partial,
                    int64_key_hash("band_hash"),
                    _band_fold_merge,
                    NPARTS,
                )
            )
            if len(s)
        ]
        if refs
        else []
    )
    partial = (
        pa.concat_tables(shard_tables)
        if shard_tables
        else pa.table(
            {
                "band": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_buckets": pa.array([], pa.int64()),
                "max_bucket": pa.array([], pa.int64()),
                "n_cand_pairs": pa.array([], pa.int64()),
            }
        )
    )
    # driver fold of <= 16 * P partial rows (bounded by bands * shards)
    band = partial["band"].to_numpy()
    order = np.argsort(band, kind="stable")
    band = band[order]
    nd = partial["n_docs"].to_numpy()[order]
    nb = partial["n_buckets"].to_numpy()[order]
    mx = partial["max_bucket"].to_numpy()[order]
    np_ = partial["n_cand_pairs"].to_numpy()[order]
    starts = np.flatnonzero(np.r_[True, band[1:] != band[:-1]])
    return pa.table(
        {
            "band": pa.array(band[starts].astype(np.int64)),
            "n_docs": pa.array(np.add.reduceat(nd, starts).astype(np.int64)),
            "n_buckets": pa.array(np.add.reduceat(nb, starts).astype(np.int64)),
            "max_bucket": pa.array(np.maximum.reduceat(mx, starts).astype(np.int64)),
            "n_cand_pairs": pa.array(np.add.reduceat(np_, starts).astype(np.int64)),
        }
    )


def _band_bucket_partial(t: pa.Table) -> pa.Table:
    """Pre-aggregate inside the block: (band, key) -> count."""
    key = t["band_hash"].to_numpy()
    band = t["band_idx"].to_numpy().astype(np.int64)
    order = np.lexsort((key, band))
    b, k = band[order], key[order]
    new = np.empty(b.size, bool)
    new[:1] = True
    np.not_equal(b[1:], b[:-1], out=new[1:])
    np.logical_or(new[1:], k[1:] != k[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, b.size))
    return pa.table(
        {
            "band_idx": pa.array(b[starts]),
            "band_hash": pa.array(k[starts]),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def _band_fold_merge(t: pa.Table) -> pa.Table:
    """Merge one shard's bucket partials (sum cnt, min band per
    band_hash — complete global buckets here), then fold to the
    per-band stats rows (<= n_bands per shard)."""
    if len(t) == 0:
        return pa.table(
            {
                "band": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_buckets": pa.array([], pa.int64()),
                "max_bucket": pa.array([], pa.int64()),
                "n_cand_pairs": pa.array([], pa.int64()),
            }
        )
    g = pa.TableGroupBy(t, "band_hash").aggregate(
        [("cnt", "sum"), ("band_idx", "min")]
    )
    band = g["band_idx_min"].to_numpy().astype(np.int64)
    cnt = g["cnt_sum"].to_numpy().astype(np.int64)
    order = np.argsort(band, kind="stable")
    band, cnt = band[order], cnt[order]
    starts = np.flatnonzero(np.r_[True, band[1:] != band[:-1]])
    seg = np.append(starts, band.size)
    return pa.table(
        {
            "band": pa.array(band[starts]),
            "n_docs": pa.array(np.add.reduceat(cnt, starts)),
            "n_buckets": pa.array(np.diff(seg)),
            "max_bucket": pa.array(np.maximum.reduceat(cnt, starts)),
            "n_cand_pairs": pa.array(np.add.reduceat(cnt * (cnt - 1) // 2, starts)),
        }
    )


QUERIES["band_stats"] = band_stats


def _build_band_stats_oracle() -> str:
    mask = (1 << 63) - 1
    return f"""
        WITH {_near_dup_chain_sql()},
        mkey AS (
          SELECT doc_id, band, CAST(key & {mask}::UBIGINT AS BIGINT) AS key
          FROM bkey
        ),
        bc AS (SELECT band, key, COUNT(*) AS cnt FROM mkey GROUP BY band, key)
        SELECT CAST(band AS BIGINT) AS band,
               CAST(SUM(cnt) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MAX(cnt) AS BIGINT) AS max_bucket,
               CAST(SUM(cnt * (cnt - 1) / 2) AS BIGINT) AS n_cand_pairs
        FROM bc GROUP BY band
    """


ORACLE_SQL["band_stats"] = _build_band_stats_oracle()


def token_bigram_rarity(sf_dir: str, k: int = 2):
    """Per-doc corpus-frequency rarity signal
    (``stages/decontam.gram_frequency_stats``): token-bigram occurrence
    count, summed global bigram frequency, and hapax count — the
    integer-exact core of a CCNet-style LM quality filter (low mean
    frequency / high hapax share flags gibberish). Oracle replays the
    token-hash -> window-fold -> occurrence-count chain with no float
    anywhere."""
    from nlshray.stages.decontam import gram_frequency_stats

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return gram_frequency_stats(docs, k=k, num_partitions=NPARTS)


QUERIES["token_bigram_rarity"] = token_bigram_rarity


def _build_bigram_rarity_oracle(k: int = 2) -> str:
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(0))
    fold_step = f"(({_sql_mulmod('acc', _SQL_POLY)}) + CAST(x AS HUGEINT)) % {_M64}"
    return f"""
        WITH tokarr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        tok AS (
          SELECT doc_id, i.i AS pos, toks[i.i] AS tok
          FROM tokarr, unnest(range(1, len(toks) + 1)) AS i(i)
        ),
        folded AS (
          SELECT doc_id, pos,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM tok
        ),
        seeded AS (SELECT doc_id, pos, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('t', 'seeded', 'x', 'pos').strip()},
        ths AS (
          SELECT doc_id, list(z ORDER BY pos) AS th, COUNT(*) AS n
          FROM t6 GROUP BY doc_id
        ),
        wins AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(th[w.w : w.w + {k} - 1],
                               x -> CAST(x AS HUGEINT))),
              (acc, x) -> {fold_step}
            ) AS raw
          FROM ths, unnest(range(1, greatest(n - {k} + 1, 0) + 1)) AS w(w)
        ),
        {_sql_splitmix('h', 'wins', 'raw', '').strip()},
        gd AS (SELECT z, COUNT(*) AS cnt FROM h6 GROUP BY z),
        per AS (
          SELECT h.doc_id, COUNT(*) AS n_grams,
                 SUM(gd.cnt) AS freq_sum,
                 SUM(CASE WHEN gd.cnt = 1 THEN 1 ELSE 0 END) AS n_hapax
          FROM h6 h JOIN gd USING (z) GROUP BY h.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(p.freq_sum, 0) AS BIGINT) AS freq_sum,
               CAST(COALESCE(p.n_hapax, 0) AS BIGINT) AS n_hapax
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


ORACLE_SQL["token_bigram_rarity"] = _build_bigram_rarity_oracle()


def semantic_dup_pairs(sf_dir: str):
    """SemDeDup-style embedding dedup (``stages/ann.embedding_near_dup``
    ``strategy="kmeans"``): pairs scored only within a coarse k-means
    cluster — the published recipe for embedding-space dedup at web
    scale (sample-fit centroids broadcast once, one argmax matmul per
    batch, per-cluster matmuls bounded by cluster size). Approximate by
    design (a cross-cluster near pair is missed), hence rows-only like
    the other approximate members; the subset/recall/determinism gates
    live in pytest over the clustered fixture."""
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_near_dup(
        emb, threshold=0.45, strategy="kmeans", n_clusters=8,
        fit_sample_frac=0.5,
    )
    return _round(to_arrow(out), {"cosine": 6})


QUERIES["semantic_dup_pairs"] = semantic_dup_pairs


def latest_event_per_user(sf_dir: str):
    """Keep-newest-per-key dedup (the crawl-snapshot shape: repeated
    fetches of one url collapse to the latest ``warc_ts``), expressed
    over events as "latest event per user" so it is SQL-oracleable on
    the driver tables. Runs on the grouped top-k semigroup combiner
    (``stages/topk.grouped_topk`` with k=1): per-block partial winners,
    one final combine, zero all-to-all shuffles — the same plan keeps
    one snapshot per url over 10^12 pages. Ties break on event_id ASC,
    replayed exactly by the oracle's ROW_NUMBER."""
    from nlshray.stages.topk import grouped_topk

    ev = _pq(sf_dir, "events")
    return grouped_topk(
        ev, "user_id", "ts", 1, ascending=False, tie_col="event_id"
    ).select_columns(["event_id", "ts", "user_id", "event_type", "value"])


QUERIES["latest_event_per_user"] = latest_event_per_user

ORACLE_SQL["latest_event_per_user"] = """
    SELECT event_id, ts, user_id, event_type, value
    FROM (
      SELECT event_id, ts, user_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id ASC
             ) AS rn
      FROM events
    ) WHERE rn = 1
"""


def lm_perplexity_scores(sf_dir: str):
    """CCNet-style LM quality signal (`stages/lm.py`): fit an MLE
    bigram model ON the corpus (combiner partial counts, one bounded
    groupby), broadcast the integer micro-nat cost table once, score
    every doc by negative log-likelihood. Integer costs make the
    per-doc sum order-independent, so the whole chain — tokenize,
    bigram counts, -ln(c12/c1) rounded to micro-nats, per-doc sum,
    perplexity — replays bit-exactly in SQL."""
    from nlshray.stages.lm import lm_perplexity

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return lm_perplexity(
        docs, seed=CFG.seed, num_partitions=NPARTS
    )


QUERIES["lm_perplexity_scores"] = lm_perplexity_scores

ORACLE_SQL["lm_perplexity_scores"] = """
    WITH tokarr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text),
               '[^0-9a-z_]+'), t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS t1, toks[i + 1] AS t2
      FROM tokarr, unnest(range(1, len(toks))) AS i(i)
    ),
    bc AS (
      SELECT t1, t2, CAST(count(*) AS BIGINT) AS c12
      FROM bg GROUP BY t1, t2
    ),
    pfx AS (
      SELECT t1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY t1
    ),
    cost AS (
      SELECT bc.t1, bc.t2,
             CAST(round(-ln(CAST(bc.c12 AS DOUBLE) / pfx.c1) * 1000000)
                  AS BIGINT) AS c
      FROM bc JOIN pfx ON bc.t1 = pfx.t1
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(co.c) AS BIGINT) AS nll_micro,
           round(exp(CAST(sum(co.c) AS DOUBLE) / 1000000.0 / count(*)),
                 6) AS ppl
    FROM bg g JOIN cost co ON g.t1 = co.t1 AND g.t2 = co.t2
    GROUP BY g.doc_id
"""


def ccnet_tiers(sf_dir: str):
    """CCNet head/middle/tail corpus tiering (`stages/lm.py`,
    Wenzek et al. 2020 §4.3): score every doc's bigram-LM perplexity,
    then split EACH LANGUAGE at its exact 0.33/0.66 perplexity
    quantiles. The whole chain — integer micro-nat scoring, the
    ceil(q*n)-rank threshold rule, the tier compares — replays
    bit-exactly in SQL (thresholds via explicit ROW_NUMBER, not any
    engine's quantile convention)."""
    from nlshray.stages.lm import lm_perplexity, perplexity_tiers

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    scores = lm_perplexity(
        docs, seed=CFG.seed, num_partitions=NPARTS, carry_cols=("lang",)
    )
    out = perplexity_tiers(scores, group_col="lang")
    return out.select_columns(["doc_id", "lang", "ppl", "tier"])


QUERIES["ccnet_tiers"] = ccnet_tiers

ORACLE_SQL["ccnet_tiers"] = """
    WITH tokarr AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text),
               '[^0-9a-z_]+'), t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang, toks[i] AS t1, toks[i + 1] AS t2
      FROM tokarr, unnest(range(1, len(toks))) AS i(i)
    ),
    bc AS (
      SELECT t1, t2, CAST(count(*) AS BIGINT) AS c12
      FROM bg GROUP BY t1, t2
    ),
    pfx AS (
      SELECT t1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY t1
    ),
    cost AS (
      SELECT bc.t1, bc.t2,
             CAST(round(-ln(CAST(bc.c12 AS DOUBLE) / pfx.c1) * 1000000)
                  AS BIGINT) AS c
      FROM bc JOIN pfx ON bc.t1 = pfx.t1
    ),
    scores AS (
      SELECT g.doc_id, g.lang,
             round(exp(CAST(sum(co.c) AS DOUBLE) / 1000000.0 / count(*)),
                   6) AS ppl
      FROM bg g JOIN cost co ON g.t1 = co.t1 AND g.t2 = co.t2
      GROUP BY g.doc_id, g.lang
    ),
    ranked AS (
      SELECT lang, ppl,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM scores
    ),
    thr AS (
      SELECT lang,
             MIN(CASE WHEN rn >= ceil(0.33 * n) THEN ppl END) AS t_head,
             MIN(CASE WHEN rn >= ceil(0.66 * n) THEN ppl END) AS t_mid
      FROM ranked GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.ppl,
           CASE WHEN s.ppl <= t.t_head THEN 'head'
                WHEN s.ppl <= t.t_mid THEN 'middle'
                ELSE 'tail' END AS tier
    FROM scores s JOIN thr t ON s.lang = t.lang
"""


def quantiles_sketch_by_lang(sf_dir: str):
    """One-pass APPROXIMATE grouped quantiles (`stages/qsketch.py`,
    KLL-style mergeable rank sketch — the scale path next to the
    exact two-pass `length_quantiles_by_lang`). Rows-only by design
    (approximate by contract, like the kNN members); pytest gates the
    rank error vs the exact operator at <= 2% and weight conservation
    exactly."""
    from nlshray.stages.qsketch import grouped_sketch_quantiles

    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"])

    def to_f64(t: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": t["lang"], "n_chars": t["n_chars"].cast(pa.float64())}
        )

    ds = docs.map_batches(to_f64, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sketch_quantiles(
        ds, "lang", "n_chars", [0.25, 0.5, 0.75, 0.9], k=256, seed=CFG.seed
    )


QUERIES["quantiles_sketch_by_lang"] = quantiles_sketch_by_lang


WEIGHTED_SAMPLE_K = 100


def weighted_sample_docs(sf_dir: str):
    """Weight-proportional without-replacement sample (A-ES,
    Efraimidis-Spirakis 2006; `stages/topk.weighted_sample`): the
    mixture-building op — sample docs proportional to length. Keys
    are pure functions of (doc_id, seed), so the sample is
    parallelism-independent and the oracle replays the identical
    splitmix chain + `-ln(((z>>11)+1)/2^53)/w` key in SQL."""
    from nlshray.stages.topk import weighted_sample

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return weighted_sample(
        docs, "n_chars", WEIGHTED_SAMPLE_K, seed=CFG.seed
    ).select_columns(["doc_id", "lang", "n_chars"])


QUERIES["weighted_sample_docs"] = weighted_sample_docs


def _build_weighted_sample_oracle(k: int) -> str:
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    return f"""
        WITH seeded AS (
          SELECT doc_id, lang, n_chars,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('w', 'seeded', 'x', 'lang, n_chars').strip()},
        keyed AS (
          SELECT doc_id, lang, n_chars,
                 -ln((CAST(z >> 11 AS DOUBLE) + 1.0)
                     / 9007199254740992.0) / n_chars AS key
          FROM w6
          WHERE n_chars > 0
        )
        SELECT doc_id, lang, n_chars FROM keyed
        ORDER BY key, doc_id LIMIT {k}
    """


ORACLE_SQL["weighted_sample_docs"] = _build_weighted_sample_oracle(
    WEIGHTED_SAMPLE_K
)


def dup_cluster_sizes(sf_dir: str):
    """Duplication profile of the corpus: histogram of flagship-dedup
    cluster sizes — (cluster_size, n_clusters, n_docs) — the one-table
    answer to "how duplicated is this crawl?". Sizes come from the
    materialized clusters table (the driver-check contract, same
    precedent as `source_dup_rates`); at 10^9+ docs compute per-cluster
    sizes with the raw-task count-merge plan (`stages/lm._lm_merge`
    kernel shape) and histogram the tiny sizes table. Integer-only;
    the oracle aggregates the recursive-CTE clusters."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    res = dedup_docs(docs, CFG, num_partitions=NPARTS)
    clus = to_arrow(res.clusters)
    cid = clus["cluster_id"].to_numpy()
    _, cnt = np.unique(cid, return_counts=True)
    size, ncl = np.unique(cnt, return_counts=True)
    return pa.table(
        {
            "cluster_size": pa.array(size.astype(np.int64)),
            "n_clusters": pa.array(ncl.astype(np.int64)),
            "n_docs": pa.array((size * ncl).astype(np.int64)),
        }
    )


QUERIES["dup_cluster_sizes"] = dup_cluster_sizes


def _build_dup_cluster_sizes_oracle() -> str:
    return f"""
        WITH RECURSIVE {_near_dup_chain_sql().strip()},
        alledge AS (
          SELECT left_id AS u, right_id AS v FROM conf
          UNION ALL
          SELECT doc_id AS u, rep_id AS v FROM rep WHERE doc_id <> rep_id
        ),
        sym AS MATERIALIZED (
          SELECT u, v FROM alledge UNION SELECT v AS u, u AS v FROM alledge
        ),
        reach(doc_id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.doc_id
        ),
        clus AS (
          SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
        ),
        sizes AS (
          SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM clus GROUP BY cluster_id
        )
        SELECT cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size
    """


ORACLE_SQL["dup_cluster_sizes"] = _build_dup_cluster_sizes_oracle()


def token_frequency_spectrum(sf_dir: str):
    """Zipf/Heaps frequency-of-frequencies report
    (`stages/spectrum.py`): for each occurrence count c, how many
    distinct tokens occur exactly c times. The full token->count
    table never converges anywhere — partitions collapse their exact
    counts to tiny partial spectra (see the stage docstring)."""
    from nlshray.stages.spectrum import token_frequency_spectrum as _tfs

    docs = _pq(sf_dir, "documents", columns=["text"])
    return _tfs(docs, seed=CFG.seed, num_partitions=NPARTS)


QUERIES["token_frequency_spectrum"] = token_frequency_spectrum

ORACLE_SQL["token_frequency_spectrum"] = """
    WITH tok AS (
      SELECT u.tok FROM (
        SELECT list_filter(regexp_split_to_array(lower(text),
                 '[^0-9a-z_]+'), t -> t <> '') AS toks
        FROM documents
      ), unnest(toks) AS u(tok)
    ),
    cnt AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
    )
    SELECT c AS occur_count, CAST(count(*) AS BIGINT) AS n_tokens
    FROM cnt GROUP BY c
"""


def event_funnel(sf_dir: str):
    """Ordered funnel view -> click -> purchase per user
    (`stages/window.funnel`): one row per user completing all three
    steps in strict timestamp order, with the greedy-earliest step
    times (greedy is complete — see the stage docstring's exchange
    argument). The oracle replays the same greedy chain as nested
    MIN-over-filtered joins."""
    from nlshray.stages.window import funnel

    ds = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return funnel(
        ds,
        key="user_id",
        ts="ts",
        type_col="event_type",
        steps=["view", "click", "purchase"],
        num_partitions=NPARTS,
    )


QUERIES["event_funnel"] = event_funnel

ORACLE_SQL["event_funnel"] = """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s0 AS (
      SELECT user_id, MIN(us) AS t_0 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s1 AS (
      SELECT e.user_id, MIN(us) AS t_1
      FROM e JOIN s0 USING (user_id)
      WHERE event_type = 'click' AND us > t_0
      GROUP BY e.user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(us) AS t_2
      FROM e JOIN s1 USING (user_id)
      WHERE event_type = 'purchase' AND us > t_1
      GROUP BY e.user_id
    )
    SELECT s0.user_id, t_0, t_1, t_2
    FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id)
"""


def embedding_pca(sf_dir: str, k: int = 8):
    """PCA projection of the embeddings (`stages/pca.py`): streaming
    covariance -> driver eigh -> broadcast basis -> one matmul per
    block. Rows-only by design (no SQL eigendecomposition); pytest
    gates exactness vs direct numpy PCA, basis orthonormality, and
    variance ordering. Output floats rounded to 6 for stability."""
    from nlshray.stages.pca import fit_pca, project_pca

    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    mean, comps, _ev = fit_pca(ds, k)
    out = project_pca(ds, mean, comps)

    def rnd(t: pa.Table) -> pa.Table:
        arr = t["pca"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        k_ = arr.type.list_size
        vals = np.round(np.asarray(arr.values, np.float64), 6)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "pca": pa.FixedSizeListArray.from_arrays(
                    pa.array(vals, pa.float64()), k_
                ),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["embedding_pca"] = embedding_pca


def lm_perplexity_by_lang(sf_dir: str):
    """CCNet faithful: one bigram LM PER LANGUAGE, each doc scored
    under its own language's model (`stages/lm.py` with
    ``group_col`` — the group hash is mixed into the pair/prefix
    keys, so the per-group conditioning costs zero extra passes).
    The oracle partitions the count/prefix/cost chain by lang."""
    from nlshray.stages.lm import lm_perplexity

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return lm_perplexity(
        docs,
        seed=CFG.seed,
        num_partitions=NPARTS,
        carry_cols=("lang",),
        group_col="lang",
    )


QUERIES["lm_perplexity_by_lang"] = lm_perplexity_by_lang

ORACLE_SQL["lm_perplexity_by_lang"] = """
    WITH tokarr AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text),
               '[^0-9a-z_]+'), t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang, toks[i] AS t1, toks[i + 1] AS t2
      FROM tokarr, unnest(range(1, len(toks))) AS i(i)
    ),
    bc AS (
      SELECT lang, t1, t2, CAST(count(*) AS BIGINT) AS c12
      FROM bg GROUP BY lang, t1, t2
    ),
    pfx AS (
      SELECT lang, t1, CAST(sum(c12) AS BIGINT) AS c1
      FROM bc GROUP BY lang, t1
    ),
    cost AS (
      SELECT bc.lang, bc.t1, bc.t2,
             CAST(round(-ln(CAST(bc.c12 AS DOUBLE) / pfx.c1) * 1000000)
                  AS BIGINT) AS c
      FROM bc JOIN pfx ON bc.lang = pfx.lang AND bc.t1 = pfx.t1
    )
    SELECT g.doc_id, g.lang,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(co.c) AS BIGINT) AS nll_micro,
           round(exp(CAST(sum(co.c) AS DOUBLE) / 1000000.0 / count(*)),
                 6) AS ppl
    FROM bg g
    JOIN cost co ON g.lang = co.lang AND g.t1 = co.t1 AND g.t2 = co.t2
    GROUP BY g.doc_id, g.lang
"""


WEIGHTED_GROUP_K = 25


def weighted_sample_by_lang(sf_dir: str):
    """Per-language A-ES weighted sample
    (`stages/topk.weighted_sample_grouped`): the k longest-doc-biased
    picks PER LANGUAGE — the per-stratum mixture builder. Identical
    splitmix key chain to `weighted_sample_docs`, ranked within
    language; ROW_NUMBER-per-partition SQL replay."""
    from nlshray.stages.topk import weighted_sample_grouped

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return weighted_sample_grouped(
        docs, "lang", "n_chars", WEIGHTED_GROUP_K, seed=CFG.seed
    ).select_columns(["doc_id", "lang", "n_chars"])


QUERIES["weighted_sample_by_lang"] = weighted_sample_by_lang


def _build_weighted_sample_by_lang_oracle(k: int) -> str:
    from nlshray.hashing import _seed_mix

    mix = int(_seed_mix(CFG.seed))
    return f"""
        WITH seeded AS (
          SELECT doc_id, lang, n_chars,
                 xor(CAST(doc_id AS UBIGINT), {mix}::UBIGINT) AS x
          FROM documents
        ),
        {_sql_splitmix('w', 'seeded', 'x', 'lang, n_chars').strip()},
        keyed AS (
          SELECT doc_id, lang, n_chars,
                 -ln((CAST(z >> 11 AS DOUBLE) + 1.0)
                     / 9007199254740992.0) / n_chars AS key
          FROM w6
          WHERE n_chars > 0
        )
        SELECT doc_id, lang, n_chars FROM keyed
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY key, doc_id
        ) <= {k}
    """


ORACLE_SQL["weighted_sample_by_lang"] = _build_weighted_sample_by_lang_oracle(
    WEIGHTED_GROUP_K
)


TFIDF_COS_THR = 0.9


def tfidf_dup_pairs(sf_dir: str):
    """TF-IDF cosine near-dup pairs (`stages/tfidf.tfidf_cosine_pairs`)
    at threshold 0.9 — the lexical-vector member of the dedup family
    (vs token-set Jaccard and embedding cosine). Threshold compares
    the ROUNDED cosine on both engines; the oracle replays the
    tf/df/smoothed-idf chain and the pairwise dot as a self-join."""
    from nlshray.stages.tfidf import tfidf_cosine_pairs

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_cosine_pairs(docs, TFIDF_COS_THR)


QUERIES["tfidf_dup_pairs"] = tfidf_dup_pairs

ORACLE_SQL["tfidf_dup_pairs"] = f"""
    WITH tokarr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, u.tok FROM tokarr, unnest(toks) AS u(tok)),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
    n AS (SELECT COUNT(*) AS n FROM documents),
    w AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * (ln((CAST(n.n AS DOUBLE) + 1)
                         / (CAST(df.df AS DOUBLE) + 1)) + 1) AS w
      FROM tf JOIN df USING (tok), n
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id,
             sum(a.w * b.w) AS dp
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT left_id, right_id,
           round(dp / (na.nrm * nb.nrm), 6) AS cosine
    FROM dot
    JOIN nrm na ON left_id = na.doc_id
    JOIN nrm nb ON right_id = nb.doc_id
    WHERE round(dp / (na.nrm * nb.nrm), 6) >= {TFIDF_COS_THR}

"""


def events_profile(sf_dir: str):
    """One-pass table profiler (`stages/profile.py` — the SUMMARIZE/
    describe utility): per numeric/timestamp column of events, row
    count, nulls, min, max, and an order-independent fixed-point sum
    (floor to 1e-4, summed in int64 — the `events_running_totals`
    trick), all from per-block scalar partials. SQL replay is a
    UNION ALL of per-column aggregates."""
    from nlshray.stages.profile import profile_table

    ev = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return profile_table(ev, ["event_id", "ts", "user_id", "value"])


QUERIES["events_profile"] = events_profile

ORACLE_SQL["events_profile"] = """
    SELECT 'event_id' AS column, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
           CAST(min(event_id) AS DOUBLE) AS min_v,
           CAST(max(event_id) AS DOUBLE) AS max_v,
           CAST(sum(event_id) AS BIGINT) AS sum_q
    FROM events
    UNION ALL
    SELECT 'ts', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(ts) AS BIGINT),
           CAST(min(epoch_us(ts)) AS DOUBLE),
           CAST(max(epoch_us(ts)) AS DOUBLE),
           CAST(0 AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(user_id) AS BIGINT),
           CAST(min(user_id) AS DOUBLE),
           CAST(max(user_id) AS DOUBLE),
           CAST(sum(user_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'value', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(value) AS BIGINT),
           CAST(min(value) AS DOUBLE),
           CAST(max(value) AS DOUBLE),
           CAST(sum(CAST(floor(value * 10000.0) AS BIGINT)) AS BIGINT)
    FROM events
"""


def events_hourly_users(sf_dir: str):
    """Exact DISTINCT-user count per 1-hour window — the windowed
    count-distinct member (exact, not sketched: per-block DISTINCT
    (hour, user) partials collapse the duplicates BEFORE the shuffle,
    then a count per hour — the two-level distinct plan that keeps
    the exchange bounded by distinct pairs, not events). The grouped
    HLL op (`distinct_tokens_by_lang_hll`) is the sketch analog."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        if uid.size and (uid.min() < 0 or uid.max() >= 10_000_000):
            raise ValueError("user_id outside packing range [0, 1e7)")
        key = np.unique(hour * np.int64(10_000_000) + uid)
        return pa.table(
            {
                "window_hour": pa.array(key // 10_000_000, pa.int64()),
                "user_id": pa.array(key % 10_000_000, pa.int64()),
            }
        )

    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    out = (
        pairs.groupby(["window_hour", "user_id"], num_partitions=NPARTS)
        .aggregate(Count(alias_name="dup"))
        .groupby("window_hour", num_partitions=NPARTS)
        .aggregate(Count(alias_name="n_users"))
    )
    return to_arrow(out)


QUERIES["events_hourly_users"] = events_hourly_users

ORACLE_SQL["events_hourly_users"] = """
    SELECT epoch_us(ts) // 3600000000 AS window_hour,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
"""


def cluster_exemplars(sf_dir: str):
    """Dup-cluster inspection table: for every NON-singleton flagship
    cluster, the representative (min doc_id == the engine's canonical
    cluster label) and the member count — what a data curator opens
    first after a dedup run. Composition over the materialized
    clusters table (driver-check contract; at scale this is one
    groupby-count over the clusters Dataset). Oracle aggregates the
    recursive-CTE clusters."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    res = dedup_docs(docs, CFG, num_partitions=NPARTS)
    clus = to_arrow(res.clusters)
    cid = clus["cluster_id"].to_numpy()
    uniq, inv, cnt = np.unique(cid, return_inverse=True, return_counts=True)
    keep = cnt >= 2
    return pa.table(
        {
            "cluster_id": pa.array(uniq[keep].astype(np.int64)),
            "n_members": pa.array(cnt[keep].astype(np.int64)),
        }
    )


QUERIES["cluster_exemplars"] = cluster_exemplars


def _build_cluster_exemplars_oracle() -> str:
    return f"""
        WITH RECURSIVE {_near_dup_chain_sql().strip()},
        alledge AS (
          SELECT left_id AS u, right_id AS v FROM conf
          UNION ALL
          SELECT doc_id AS u, rep_id AS v FROM rep WHERE doc_id <> rep_id
        ),
        sym AS MATERIALIZED (
          SELECT u, v FROM alledge UNION SELECT v AS u, u AS v FROM alledge
        ),
        reach(doc_id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.doc_id
        ),
        clus AS (
          SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
        )
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        FROM clus GROUP BY cluster_id HAVING count(*) >= 2
    """


ORACLE_SQL["cluster_exemplars"] = _build_cluster_exemplars_oracle()


def normalized_dup_docs(sf_dir: str):
    """CCNet-style normalized exact dedup: casefold + whitespace-collapse
    the text, then run the exact-dup plan on the NORMALIZED key — the
    cheap pre-pass that kills trivially-reformatted copies (case flips,
    re-wrapped whitespace) before MinHash ever runs. Same distributed
    shape as ``exact_dup_docs`` (hash projection, per-block
    pre-aggregated groups, text never shuffled); the normalization is
    three vectorized Arrow/RE2 kernels, replayed exactly by the oracle's
    lower/regexp_replace/trim chain."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        x = pc.utf8_lower(arr)
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim(x, " ")
        return pa.table({"doc_id": t["doc_id"], "text": x})

    nd = docs.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
    out = exact_stage(nd, num_partitions=NPARTS)
    t = to_arrow(out.select_columns(["doc_id", "rep_id", "n_copies"]))
    return t.rename_columns(["doc_id", "keep_id", "n_copies"])


QUERIES["normalized_dup_docs"] = normalized_dup_docs

ORACLE_SQL["normalized_dup_docs"] = r"""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY ntext) AS keep_id,
           COUNT(*)    OVER (PARTITION BY ntext) AS n_copies
    FROM (SELECT doc_id,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext
          FROM documents)
"""


def length_pct_rank_by_lang(sf_dir: str):
    """Windowed PERCENT_RANK over (lang, n_chars) WITHOUT the per-group
    corpus sort (``stages/quantiles.py:grouped_percent_rank``): histogram
    partials -> driver CDF -> broadcast searchsorted attach. The
    percentile-rank column is what score-threshold curation (CCNet
    head/middle/tail, quality cutoffs) consumes at 100 TB."""
    from nlshray.stages.quantiles import grouped_percent_rank

    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = grouped_percent_rank(docs, "lang", "n_chars", out_col="pct_rank")

    def rnd(t: pa.Table) -> pa.Table:
        pct = _round_np(t["pct_rank"].to_numpy(), 10)
        return t.set_column(
            t.schema.get_field_index("pct_rank"),
            "pct_rank",
            pa.array(pct, pa.float64()),
        )

    return out.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["length_pct_rank_by_lang"] = length_pct_rank_by_lang

ORACLE_SQL["length_pct_rank_by_lang"] = """
    SELECT doc_id, lang, n_chars,
           ROUND(PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars),
                 10) AS pct_rank
    FROM documents
"""


def compression_ratios(sf_dir: str):
    """Gopher-style deflate-ratio quality signal: compressed/raw byte
    ratio per doc (zlib level 6, stdlib only) — low ratio = repetitive
    boilerplate, high = natural text. No SQL equivalent exists (DuckDB
    has no deflate scalar), so this is rows-only by design; determinism
    and parallelism-independence are pinned in pytest instead. The
    per-row C call is the whole cost — there is no vectorized deflate —
    so the stage is a plain task-pool ``map_batches`` sized by bytes."""
    import zlib

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        raw = np.array([len(s.encode("utf-8")) for s in texts], np.int64)
        comp = np.array(
            [len(zlib.compress(s.encode("utf-8"), 6)) for s in texts],
            np.int64,
        )
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(raw),
                "compression_ratio": pa.array(
                    _round_np(ratio, 6), pa.float64()
                ),
            }
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    )


QUERIES["compression_ratios"] = compression_ratios


def length_mad_by_lang(sf_dir: str):
    """Robust per-language stats (median / MAD / robust-z outlier count
    at k=3) in ONE histogram pass (``stages/quantiles.py:grouped_mad``)
    — the outlier-resistant twin of ``lang_summary``'s mean/avg. The
    oracle replays the same quantile_disc median -> deviation median ->
    filtered count chain in three CTEs."""
    from nlshray.stages.quantiles import grouped_mad

    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_mad(docs, "lang", "n_chars", outlier_k=3)


QUERIES["length_mad_by_lang"] = length_mad_by_lang

ORACLE_SQL["length_mad_by_lang"] = """
    WITH medt AS (
      SELECT lang, quantile_disc(n_chars, 0.5) AS med
      FROM documents GROUP BY lang
    ),
    dev AS (
      SELECT d.lang, m.med, abs(d.n_chars - m.med) AS ad
      FROM documents d JOIN medt m USING (lang)
    ),
    madt AS (
      SELECT lang, quantile_disc(ad, 0.5) AS mad FROM dev GROUP BY lang
    )
    SELECT dev.lang,
           CAST(MIN(dev.med) AS BIGINT) AS med,
           CAST(MIN(madt.mad) AS BIGINT) AS mad,
           CAST(COUNT(*) FILTER (WHERE dev.ad > 3 * madt.mad) AS BIGINT)
               AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM dev JOIN madt USING (lang) GROUP BY dev.lang
"""


def lang_source_mi(sf_dir: str):
    """Corpus composition audit: entropies H(lang), H(source), H(joint)
    and mutual information I(lang; source) in nats — "does source
    predict language?" is the first skew question a mixture curator
    asks. The corpus-level application of the reference's
    entropy/KL kernel family (``nlsh/learning/distances.py:76-131``):
    one bounded groupby-count shuffle (|langs| x |sources| cells),
    driver arithmetic on the joint histogram, nothing else moves."""
    docs = _pq(sf_dir, "documents", columns=["lang", "source"])
    joint = to_arrow(
        docs.groupby(["lang", "source"], num_partitions=NPARTS).aggregate(
            Count(alias_name="n")
        )
    )
    langs = joint["lang"].to_pylist()
    srcs = joint["source"].to_pylist()
    c = joint["n"].to_numpy().astype(np.float64)
    n = c.sum()
    p = c / n
    # marginals by key accumulation (domain-bounded)
    pl: dict[str, float] = {}
    ps: dict[str, float] = {}
    for la, so, pi in zip(langs, srcs, p):
        pl[la] = pl.get(la, 0.0) + pi
        ps[so] = ps.get(so, 0.0) + pi
    h_lang = -sum(v * np.log(v) for v in pl.values())
    h_source = -sum(v * np.log(v) for v in ps.values())
    h_joint = -float(np.sum(p * np.log(p)))
    mi = h_lang + h_source - h_joint
    r6 = lambda x: float(_round_np(np.float64(x), 6))
    return pa.table(
        {
            "h_lang": pa.array([r6(h_lang)], pa.float64()),
            "h_source": pa.array([r6(h_source)], pa.float64()),
            "h_joint": pa.array([r6(h_joint)], pa.float64()),
            "mi": pa.array([r6(mi)], pa.float64()),
            "n_rows": pa.array([int(n)], pa.int64()),
        }
    )


QUERIES["lang_source_mi"] = lang_source_mi

ORACLE_SQL["lang_source_mi"] = """
    WITH joint AS (
      SELECT lang, source, COUNT(*)::DOUBLE AS c FROM documents
      GROUP BY lang, source
    ),
    tot AS (SELECT SUM(c) AS n FROM joint),
    ml AS (SELECT lang, SUM(c) AS cl FROM joint GROUP BY lang),
    ms AS (SELECT source, SUM(c) AS cs FROM joint GROUP BY source)
    SELECT
      ROUND((SELECT -SUM((cl/n) * LN(cl/n)) FROM ml, tot), 6) AS h_lang,
      ROUND((SELECT -SUM((cs/n) * LN(cs/n)) FROM ms, tot), 6) AS h_source,
      ROUND((SELECT -SUM((c/n) * LN(c/n)) FROM joint, tot), 6) AS h_joint,
      ROUND((SELECT -SUM((cl/n) * LN(cl/n)) FROM ml, tot)
          + (SELECT -SUM((cs/n) * LN(cs/n)) FROM ms, tot)
          - (SELECT -SUM((c/n) * LN(c/n)) FROM joint, tot), 6) AS mi,
      (SELECT CAST(n AS BIGINT) FROM tot) AS n_rows
"""


def modal_length_by_lang(sf_dir: str):
    """Per-group mode with a DETERMINISTIC tie-break (smallest value
    among the argmax counts — SQL mode() leaves ties unspecified, so
    the oracle replays the rule with ROW_NUMBER instead). Same
    zero-shuffle histogram plan as the quantile/MAD family."""
    from nlshray.stages.quantiles import _hist_partial

    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"])
    hist: dict[tuple, int] = {}
    for b in docs.map_batches(
        _hist_partial,
        fn_kwargs={"group_col": "lang", "value_col": "n_chars"},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for g, v, cn in zip(
            b["lang"].to_pylist(), b["value"].to_pylist(), b["n"].to_pylist()
        ):
            hist[(g, v)] = hist.get((g, v), 0) + int(cn)
    out = {"lang": [], "modal_n_chars": [], "n_modal": []}
    for g in sorted({g for g, _ in hist}):
        items = sorted((v, hist[(g, v)]) for gg, v in hist if gg == g)
        best_v, best_n = min(items, key=lambda t: (-t[1], t[0]))
        out["lang"].append(g)
        out["modal_n_chars"].append(int(best_v))
        out["n_modal"].append(int(best_n))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "modal_n_chars": pa.array(out["modal_n_chars"], pa.int64()),
            "n_modal": pa.array(out["n_modal"], pa.int64()),
        }
    )


QUERIES["modal_length_by_lang"] = modal_length_by_lang

ORACLE_SQL["modal_length_by_lang"] = """
    SELECT lang, n_chars AS modal_n_chars, n AS n_modal FROM (
      SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, n_chars ASC) AS rn
      FROM documents GROUP BY lang, n_chars
    ) WHERE rn = 1
"""


# C4-style word blocklist (fixture-vocabulary terms; the real pipeline
# swaps in its policy list). Leftmost word-boundary match attributes
# the hit — RE2 semantics on BOTH sides (Arrow C++ and DuckDB).
_BLOCKLIST = ("spark", "spill", "admin")
# same RE2 pattern both sides; Arrow's extract_regex requires a NAMED
# group, DuckDB's regexp_extract takes the group by index
_BLOCK_RE_ARROW = r"\b(?P<term>" + "|".join(_BLOCKLIST) + r")\b"
_BLOCK_RE_SQL = r"\b(" + "|".join(_BLOCKLIST) + r")\b"


def blocklist_filter(sf_dir: str):
    """C4-style badword filter: flag every doc containing a blocklist
    term (word-boundary match), attributing the LEFTMOST hit. One
    vectorized RE2 kernel per batch (`extract_regex`) — no per-row
    Python, no shuffle; the policy list ships as a compiled alternation
    in the task closure. Oracle replays with regexp_extract on the
    identical pattern."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        hit = pc.extract_regex(arr, _BLOCK_RE_ARROW)
        term = pc.fill_null(pc.struct_field(hit, 0), "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "blocked": pc.not_equal(term, ""),
                "matched_term": term,
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["blocklist_filter"] = blocklist_filter

ORACLE_SQL["blocklist_filter"] = rf"""
    SELECT doc_id,
           regexp_extract(text, '{_BLOCK_RE_SQL}', 1) <> '' AS blocked,
           regexp_extract(text, '{_BLOCK_RE_SQL}', 1) AS matched_term
    FROM documents
"""


def snapshot_drift_ks(sf_dir: str):
    """Distribution-drift detector between two crawl snapshots (the
    even/odd doc_id split, as in ``novel_docs_incremental``): the
    two-sample Kolmogorov-Smirnov statistic over doc length, exact —
    ``max |CDF_even(v) - CDF_odd(v)|`` over the observed support. Both
    empirical CDFs come off ONE histogram pass (the per-(side, value)
    counts are the sufficient statistics), zero shuffles; the textbook
    plan sorts both corpora. Output: the KS statistic, the value where
    the gap peaks (smallest such value — deterministic), and both
    sample sizes."""
    from nlshray.stages.quantiles import _hist_partial

    docs = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        side = pc.if_else(
            pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0),
            pa.scalar("even"),
            pa.scalar("odd"),
        )
        return pa.table({"side": side, "n_chars": t["n_chars"]})

    hist: dict[tuple, int] = {}
    for b in docs.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _hist_partial,
        fn_kwargs={"group_col": "side", "value_col": "n_chars"},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for g, v, n in zip(
            b["side"].to_pylist(), b["value"].to_pylist(), b["n"].to_pylist()
        ):
            hist[(g, v)] = hist.get((g, v), 0) + int(n)

    support = np.array(sorted({v for _, v in hist}), np.int64)
    ce = np.cumsum([hist.get(("even", int(v)), 0) for v in support]).astype(
        np.float64
    )
    co = np.cumsum([hist.get(("odd", int(v)), 0) for v in support]).astype(
        np.float64
    )
    n_e, n_o = ce[-1], co[-1]
    gap = np.abs(ce / n_e - co / n_o)
    i = int(np.argmax(gap))  # first (= smallest value) at the max gap
    return pa.table(
        {
            "ks_stat": pa.array([float(_round_np(gap[i], 6))], pa.float64()),
            "at_n_chars": pa.array([int(support[i])], pa.int64()),
            "n_even": pa.array([int(n_e)], pa.int64()),
            "n_odd": pa.array([int(n_o)], pa.int64()),
        }
    )


QUERIES["snapshot_drift_ks"] = snapshot_drift_ks

ORACLE_SQL["snapshot_drift_ks"] = """
    WITH sup AS (SELECT DISTINCT n_chars AS x FROM documents),
    tot AS (
      SELECT COUNT(*) FILTER (WHERE doc_id % 2 = 0)::DOUBLE AS ne,
             COUNT(*) FILTER (WHERE doc_id % 2 = 1)::DOUBLE AS no
      FROM documents
    ),
    gaps AS (
      SELECT sup.x,
             ABS((SELECT COUNT(*) FROM documents d
                  WHERE d.doc_id % 2 = 0 AND d.n_chars <= sup.x) / tot.ne
               - (SELECT COUNT(*) FROM documents d
                  WHERE d.doc_id % 2 = 1 AND d.n_chars <= sup.x) / tot.no)
               AS gap
      FROM sup, tot
    )
    SELECT ROUND((SELECT MAX(gap) FROM gaps), 6) AS ks_stat,
           (SELECT MIN(x) FROM gaps WHERE gap = (SELECT MAX(gap) FROM gaps))
               AS at_n_chars,
           (SELECT CAST(ne AS BIGINT) FROM tot) AS n_even,
           (SELECT CAST(no AS BIGINT) FROM tot) AS n_odd
"""


def line_dedup_docs(sf_dir: str, min_docs: int = 2):
    """CCNet/Dolma-style cross-document LINE dedup: rewrite every doc
    dropping each line that occurs in >= ``min_docs`` distinct docs
    (boilerplate — banners, footers), preserving surviving-line order.
    Boilerplate lines are the heavy hitters of the within-doc-deduped
    line stream, so the plan reuses the CountMin candidate filter of
    ``stages/heavy.py``: sketch pass -> exact candidate count ->
    broadcast set -> vectorized rewrite (``stages/linededup.py``).
    Doc text never shuffles; the only per-line rows that move are the
    CMS-admitted candidates. On the sf corpora no text contains a
    newline, so this verifies the identity path end-to-end (every doc
    one unique line, nothing dropped); the multi-line semantics are
    pinned by tests/test_linededup.py against a pure-python reference.
    """
    from nlshray.stages.linededup import line_dedup

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return line_dedup(docs, min_docs, num_partitions=NPARTS)


QUERIES["line_dedup_docs"] = line_dedup_docs

ORACLE_SQL["line_dedup_docs"] = """
    WITH lines AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS ord
      FROM documents
    ),
    freq AS (
      SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY line
    )
    SELECT l.doc_id,
           COALESCE(
             string_agg(CASE WHEN f.nd < 2 THEN l.line END,
                        chr(10) ORDER BY l.ord),
             '') AS clean_text,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (WHERE f.nd >= 2) AS n_dropped
    FROM lines l JOIN freq f USING (line)
    GROUP BY l.doc_id
"""


def containment_pairs(sf_dir: str, threshold: float = 0.9):
    """Token-set OVERLAP COEFFICIENT (Szymkiewicz-Simpson,
    ``|A∩B| / min(|A|,|B|)``) over all doc pairs, >= threshold — the
    subset-detection member of the dedup family: a short doc quoted
    whole inside a long one scores ~1.0 here while its Jaccard
    (``ngram_jaccard_pairs``) can be arbitrarily small, so doc-level
    Jaccard dedup never finds it. Same broadcast-corpus segmented
    searchsorted kernel as the Jaccard brute member (one corpus scan
    per doc, no python inner loop); the scalable route for this
    predicate is the prefix-filtered set-similarity join
    (``stages/ssjoin``) — LSH banding cannot bound recall for
    containment because the Jaccard of a true subset pair is
    unbounded below.
    """
    from nlshray.functions.shingles import batch_token_hashes

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    ids_c, val_c, len_c = [], [], []

    def tok_sets(t: pa.Table) -> pa.Table:
        flat, counts = batch_token_hashes(t["text"])
        ends = np.cumsum(counts)
        sets = [
            np.unique(flat[e - c : e]).tolist() for c, e in zip(counts, ends)
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "toks": pa.array(sets, pa.list_(pa.uint64())),
            }
        )

    for b in docs.map_batches(
        tok_sets, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids_c.append(np.asarray(b["doc_id"]))
        col = b["toks"].combine_chunks()
        val_c.append(np.asarray(col.values, dtype=np.uint64))
        len_c.append(np.diff(np.asarray(col.offsets)).astype(np.int64))
    ids = np.concatenate(ids_c) if ids_c else np.empty(0, np.int64)
    lens = np.concatenate(len_c) if len_c else np.empty(0, np.int64)
    vals = np.concatenate(val_c) if val_c else np.empty(0, np.uint64)
    order = np.argsort(ids)
    seg_ends = np.cumsum(lens)
    seg_starts = seg_ends - lens
    take = np.concatenate(
        [np.arange(seg_starts[i], seg_ends[i]) for i in order]
    ) if ids.shape[0] else np.empty(0, np.int64)
    cids = ids[order]
    csizes = lens[order]
    cends = np.cumsum(csizes)
    corpus_ref = ray.put((cids, vals[take], cends, csizes))
    thr = float(threshold)

    def pairs(t: pa.Table) -> pa.Table:
        cids_, cflat, cends_, csizes_ = ray.get(corpus_ref)
        cstarts_ = cends_ - csizes_
        flat, counts = batch_token_hashes(t["text"])
        qids = t["doc_id"].to_numpy()
        qends = np.cumsum(counts)
        lefts, rights, ovls = [], [], []
        cs_buf = np.empty(cflat.shape[0] + 1, np.int64)
        for i in range(qids.shape[0]):
            mine = np.unique(flat[qends[i] - counts[i] : qends[i]])
            did = qids[i]
            if not mine.shape[0]:
                continue
            pos = np.searchsorted(mine, cflat)
            pos[pos == mine.shape[0]] = 0
            hits = mine[pos] == cflat
            cs_buf[0] = 0
            np.cumsum(hits, out=cs_buf[1:])
            inter = cs_buf[cends_] - cs_buf[cstarts_]
            denom = np.minimum(mine.shape[0], csizes_)
            ovl = np.where(denom > 0, inter / np.maximum(denom, 1), 0.0)
            sel = (ovl >= thr) & (cids_ > did) & (csizes_ > 0)
            lefts.append(np.full(int(sel.sum()), did, np.int64))
            rights.append(cids_[sel])
            ovls.append(_round_np(ovl[sel], 6))
        return pa.table(
            {
                "left_id": pa.array(
                    np.concatenate(lefts) if lefts else np.empty(0, np.int64)
                ),
                "right_id": pa.array(
                    np.concatenate(rights) if rights else np.empty(0, np.int64)
                ),
                "overlap": pa.array(
                    np.concatenate(ovls) if ovls else np.empty(0, np.float64)
                ),
            }
        )

    return docs.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )


QUERIES["containment_pairs"] = containment_pairs

ORACLE_SQL["containment_pairs"] = """
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(
               regexp_split_to_array(lower(text), '\\W+'), x -> x != ''
             )) AS ts
      FROM documents
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
           ROUND(CAST(length(list_intersect(a.ts, b.ts)) AS DOUBLE) /
                 LEAST(length(a.ts), length(b.ts)), 6) AS overlap
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE length(a.ts) > 0 AND length(b.ts) > 0
      AND CAST(length(list_intersect(a.ts, b.ts)) AS DOUBLE) /
          LEAST(length(a.ts), length(b.ts)) >= 0.9
"""


def ssjoin_jaccard_pairs(sf_dir: str, threshold: float = 0.9):
    """Exact Jaccard-threshold pairs via the prefix-filtered
    set-similarity join (``stages/ssjoin`` — AllPairs/Vernica plan):
    the same predicate as ``ngram_jaccard_pairs`` through a completely
    different physical plan — token-grouped shuffle with a lossless
    prefix filter instead of a broadcast corpus — so the two members
    cross-check each other AND the shared SQL oracle. This is the
    100-TB route for exact-recall similarity joins; the brute member
    stops at ``_NGRAM_BF_LIMIT`` docs."""
    from nlshray.stages.ssjoin import ssjoin_jaccard

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return ssjoin_jaccard(docs, threshold, num_partitions=NPARTS)


QUERIES["ssjoin_jaccard_pairs"] = ssjoin_jaccard_pairs

ORACLE_SQL["ssjoin_jaccard_pairs"] = ORACLE_SQL["ngram_jaccard_pairs"]


def token_entropy(sf_dir: str):
    """Per-doc unigram Shannon entropy (bits) — the information-density
    quality signal next to ``repetition_stats`` (fraction-based) and
    ``compression_ratios`` (deflate-based): templated/spammy docs score
    low, diverse prose scores near log2(n_types). One segmented kernel
    per batch: sort (doc, token-hash), run-length the repeats, then
    ``H = log2(n) - sum(c*log2(c))/n`` per doc segment — the identical
    formula the oracle evaluates on token STRINGS (a 64-bit token-hash
    collision would flip the entropy and fail the hash-match)."""
    from nlshray.functions.nputil import lexsort2, segment_ids
    from nlshray.functions.shingles import batch_token_hashes

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts = batch_token_hashes(t["text"])
        n_tok = counts.astype(np.int64)
        ent = np.zeros(ids.shape[0], np.float64)
        if flat.shape[0]:
            doc_idx = segment_ids(counts)
            order = lexsort2(flat.astype(np.int64), doc_idx)
            d_s, f_s = doc_idx[order], flat[order]
            first = np.concatenate(
                [[True], (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])]
            )
            starts = np.flatnonzero(first)
            runs = np.diff(np.concatenate([starts, [f_s.shape[0]]]))
            contrib = runs * np.log2(runs)
            sums = np.bincount(
                d_s[starts], weights=contrib, minlength=ids.shape[0]
            )
            nz = n_tok > 0
            ent[nz] = np.log2(n_tok[nz]) - sums[nz] / n_tok[nz]
        keep = n_tok > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_tokens": pa.array(n_tok[keep]),
                "entropy": pa.array(_round_np(ent[keep], 6)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["token_entropy"] = token_entropy

ORACLE_SQL["token_entropy"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '\\W+'), x -> x != ''
             )) AS tok
      FROM documents
    ),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY 1)
    SELECT t.doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           ROUND(log2(t.n) - SUM(c.c * log2(c.c)) / t.n, 6) AS entropy
    FROM cnt c JOIN tot t USING (doc_id)
    GROUP BY t.doc_id, t.n
"""


def bm25_search(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Okapi BM25 lexical retrieval (Robertson et al., TREC-3; the
    Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` IDF form; k1=1.2, b=0.75):
    the first ``n_queries`` docs (doc_id < n) are the query set, scored
    against the whole corpus, top-``k`` per query — the lexical
    companion to ``knn_cosine`` (same query convention, same output
    shape). Plan: one stats pass (N, avgdl via exact integer sums, and
    df restricted to the QUERY term union — a few hundred counters, not
    the vocabulary), then one scoring pass per batch: matched-token
    run-length tf, dense (docs x terms) contribution, one small matmul
    against the (queries x terms) membership matrix, finished by the
    grouped top-k semigroup combiner (zero shuffles end to end; both
    broadcasts ride the task closure / ray.put)."""
    from nlshray.functions.nputil import isin_sorted, lexsort2, segment_ids
    from nlshray.functions.shingles import batch_token_hashes
    from nlshray.stages.topk import grouped_topk

    K1, B = 1.2, 0.75
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    # -- query term sets (n_queries rows: a driver-side constant) -----
    q_rows = sorted(
        docs.filter(expr=f"doc_id < {n_queries}").take_all(),
        key=lambda r: r["doc_id"],
    )
    q_tab = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in q_rows], pa.int64()),
            "text": pa.array([r["text"] for r in q_rows]),
        }
    )
    qflat, qcounts = batch_token_hashes(q_tab["text"])
    q_ids = q_tab["doc_id"].to_numpy()
    qends = np.cumsum(qcounts)
    q_terms = [
        np.unique(qflat[e - c : e]) for c, e in zip(qcounts, qends)
    ]
    terms = np.unique(np.concatenate(q_terms)) if q_terms else np.empty(
        0, np.uint64
    )
    T = terms.shape[0]
    member = np.zeros((len(q_terms), T), np.float64)
    for qi, ts in enumerate(q_terms):
        member[qi, np.searchsorted(terms, ts)] = 1.0

    # -- stats pass: N, sum(dl), df over the query-term union ---------
    def stats_partial(t: pa.Table) -> pa.Table:
        flat, counts = batch_token_hashes(t["text"])
        df = np.zeros(T, np.int64)
        if flat.shape[0] and T:
            doc_idx = segment_ids(counts)
            hit = isin_sorted(terms, flat)
            ti = np.searchsorted(terms, flat[hit])
            di = doc_idx[hit]
            if ti.shape[0]:
                order = lexsort2(ti, di)
                d_s, t_s = di[order], ti[order]
                first = np.concatenate(
                    [[True], (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])]
                )
                np.add.at(df, t_s[first], 1)
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "dl_sum": pa.array([int(counts.sum())], pa.int64()),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    N, dl_sum = 0, 0
    df = np.zeros(T, np.int64)
    for b in docs.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        N += int(pc.sum(b["n_docs"]).as_py())
        dl_sum += int(pc.sum(b["dl_sum"]).as_py())
        dfl = b["df"].combine_chunks()
        df += np.asarray(dfl.values, np.int64).reshape(-1, T).sum(axis=0) if T else 0
    avgdl = dl_sum / max(N, 1)
    idf = np.log1p((N - df + 0.5) / (df + 0.5)) if T else np.zeros(0)
    bc = ray.put((terms, idf, member, q_ids, avgdl))

    # -- scoring pass --------------------------------------------------
    def score(t: pa.Table) -> pa.Table:
        terms_, idf_, member_, q_ids_, avgdl_ = ray.get(bc)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts = batch_token_hashes(t["text"])
        nb, nq = ids.shape[0], q_ids_.shape[0]
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if not (flat.shape[0] and terms_.shape[0] and nb and nq):
            return empty
        doc_idx = segment_ids(counts)
        hit = isin_sorted(terms_, flat)
        ti = np.searchsorted(terms_, flat[hit])
        di = doc_idx[hit]
        if not ti.shape[0]:
            return empty
        order = lexsort2(ti, di)
        d_s, t_s = di[order], ti[order]
        first = np.concatenate(
            [[True], (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])]
        )
        starts = np.flatnonzero(first)
        tf = np.diff(np.concatenate([starts, [d_s.shape[0]]])).astype(
            np.float64
        )
        dr, tr = d_s[starts], t_s[starts]
        norm = K1 * (1.0 - B + B * counts[dr] / avgdl_)
        contrib = idf_[tr] * tf * (K1 + 1.0) / (tf + norm)
        dense = np.zeros((nb, terms_.shape[0]), np.float64)
        dense[dr, tr] = contrib
        scores = dense @ member_.T  # (docs x queries)
        qi, bi = np.meshgrid(np.arange(nq), np.arange(nb), indexing="ij")
        keep = (scores.T > 0) & (q_ids_[qi] != ids[bi])
        return pa.table(
            {
                "query_id": pa.array(q_ids_[qi[keep]], pa.int64()),
                "neighbor_id": pa.array(ids[bi[keep]], pa.int64()),
                "score": pa.array(_round_np(scores.T[keep], 6)),
            }
        )

    scored = docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_topk(
        scored, "query_id", "score", k, ascending=False, tie_col="neighbor_id"
    )


QUERIES["bm25_search"] = bm25_search

ORACLE_SQL["bm25_search"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '\\W+'), x -> x != ''
             )) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT CAST(SUM(n) AS DOUBLE) /
                     (SELECT COUNT(*) FROM documents) FROM dl) AS avgdl
    ),
    qterms AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM toks WHERE doc_id < 5
    ),
    df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df
      FROM toks WHERE tok IN (SELECT DISTINCT tok FROM qterms)
      GROUP BY tok
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN (SELECT DISTINCT tok FROM qterms)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT q.query_id, t.doc_id AS neighbor_id,
             SUM(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * t.tf * 2.2
                 / (t.tf + 1.2 * (0.25 + 0.75 * dl.n / s.avgdl))) AS score
      FROM qterms q
      JOIN tf t USING (tok)
      JOIN df d USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      WHERE t.doc_id != q.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, ROUND(score, 6) AS score
    FROM scored
    WHERE score > 0
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY ROUND(score, 6) DESC, neighbor_id
    ) <= 10
"""


def exact_substring_dedup_docs(sf_dir: str, k: int = 8):
    """ExactSubstr rewrite (Lee et al. 2021): drop every token covered
    by a k-token window that also occurs in another doc — the rewrite
    companion to the ``duplicate_spans`` report, sharing its dup-gram
    broadcast pass (``stages/decontam.dup_gram_sorted_ref``). Coverage
    expansion is a +1/-1 boundary scatter + cumsum per block; text
    never shuffles. The oracle replays windows on actual token strings
    (string_agg window frame), so a 64-bit window-hash collision fails
    the hash-match."""
    from nlshray.stages.decontam import exact_substring_dedup

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_substring_dedup(docs, k=k, num_partitions=NPARTS)


QUERIES["exact_substring_dedup"] = exact_substring_dedup_docs

ORACLE_SQL["exact_substring_dedup"] = """
    WITH base AS (
      SELECT doc_id, list_filter(
               regexp_split_to_array(lower(text), '\\W+'), x -> x != ''
             ) AS ts
      FROM documents
    ),
    toks AS (
      SELECT doc_id, unnest(ts) AS tok,
             unnest(range(1, len(ts) + 1)) AS pos, len(ts) AS n
      FROM base WHERE len(ts) > 0
    ),
    wins AS (
      SELECT doc_id, pos, n,
             string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
      FROM toks
    ),
    fullwins AS (SELECT doc_id, pos, win FROM wins WHERE pos + 7 <= n),
    dup AS (
      SELECT win FROM fullwins GROUP BY win
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    flagged AS (SELECT f.doc_id, f.pos FROM fullwins f JOIN dup USING (win)),
    covered AS (
      SELECT DISTINCT doc_id, pos + u.o AS cpos
      FROM flagged, (SELECT unnest(range(0, 8)) AS o) u
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.cpos IS NULL THEN t.tok END,
                               ' ' ORDER BY t.pos), '') AS clean_text,
           COUNT(*) AS n_tokens,
           COUNT(c.cpos) AS n_removed
    FROM toks t
    LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
    GROUP BY t.doc_id
"""


def bpe_word_counts(sf_dir: str, min_count: int = 5, k: int = 200):
    """BPE training prep: the corpus word-TYPE frequency table
    (`stages/bpe.py:word_type_counts`) — per-block Arrow value_counts
    partials, one bounded groupby-sum over types, exact global
    min-count prune (each partition holds complete counts for its
    keys). Top-k with a deterministic (n DESC, word ASC) boundary so
    the LIMIT cutoff is parallelism-independent. At 100 TB only
    (word, count) rows shuffle — the text never moves."""
    from nlshray.stages.bpe import word_type_counts

    docs = _pq(sf_dir, "documents", columns=["text"])
    wt = word_type_counts(docs, min_count=min_count, nparts=NPARTS)
    return wt.sort(["n", "word"], descending=[True, False]).limit(k)


QUERIES["bpe_word_counts"] = bpe_word_counts

ORACLE_SQL["bpe_word_counts"] = """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS word
      FROM documents
    )
    SELECT word, COUNT(*) AS n
    FROM toks
    WHERE length(word) BETWEEN 1 AND 64
    GROUP BY word
    HAVING COUNT(*) >= 5
    ORDER BY n DESC, word
    LIMIT 200
"""


def bpe_vocab(sf_dir: str, num_merges: int = 200):
    """Distributed BPE tokenizer training (`stages/bpe.py:fit_bpe`):
    the merge list learned over the word-type table. Iterative merges
    are not SQL-expressible (rows-only check); determinism is pytest-
    gated instead — identical merges across different partitionings,
    plus the Sennrich toy-corpus golden in `tests/test_bpe.py`."""
    from nlshray.stages.bpe import fit_bpe_from_dataset

    docs = _pq(sf_dir, "documents", columns=["text"])
    merges = fit_bpe_from_dataset(docs, num_merges=num_merges, min_count=2, nparts=NPARTS)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
            "merged": pa.array([a + b for a, b in merges], pa.string()),
        }
    )


QUERIES["bpe_vocab"] = bpe_vocab


def bpe_token_counts(sf_dir: str, num_merges: int = 200):
    """Per-doc BPE token counts with a vocab trained on the same corpus
    (`stages/bpe.py:BpeEncoder`): merge ranks broadcast once via
    ray.put, each batch encodes its DISTINCT words through a per-actor
    cache (O(types), not O(tokens)), lengths segment-summed back to
    docs. Rows-only: the greedy merge application is not SQL-
    expressible; pytest gates roundtrip + parallelism-independence."""
    from nlshray.stages.bpe import BpeEncoder, fit_bpe_from_dataset

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    merges = fit_bpe_from_dataset(docs, num_merges=num_merges, min_count=2, nparts=NPARTS)
    ref = ray.put(merges)
    out = docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return out.sort("doc_id")


QUERIES["bpe_token_counts"] = bpe_token_counts


def nb_quality_scores_q(sf_dir: str):
    """Trained Naive-Bayes quality classifier (`stages/classifier.py`):
    CCNet-style reference-vs-crawl filter. Label rule: source in
    ('src0','src1') is the trusted reference slice. Training (token-
    class count combiner, one vocab-bounded groupby) and scoring
    (broadcast integer micro-nat weights, per-doc int64 sums) are both
    order-independent, so the ENTIRE train-then-score chain replays
    bit-exactly in SQL."""
    from nlshray.stages.classifier import nb_quality_scores

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return nb_quality_scores(docs, pos_sources=("src0", "src1"), nparts=NPARTS).sort(
        "doc_id"
    )


QUERIES["nb_quality_scores"] = nb_quality_scores_q

ORACLE_SQL["nb_quality_scores"] = """
    WITH lab AS (
      SELECT doc_id,
             CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END AS label,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, label, unnest(toks) AS tok FROM lab),
    cc AS (
      SELECT tok,
             SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n_neg
      FROM tok GROUP BY tok
    ),
    tot AS (
      SELECT SUM(n_pos) AS t1, SUM(n_neg) AS t0, COUNT(*) AS v FROM cc
    ),
    w AS (
      SELECT tok,
             CAST(round((ln((n_pos + 1) / CAST(t1 + v AS DOUBLE))
                       - ln((n_neg + 1) / CAST(t0 + v AS DOUBLE))) * 1000000)
                  AS BIGINT) AS w
      FROM cc, tot
    ),
    pri AS (
      SELECT CAST(round(ln(GREATEST(SUM(label), 1)
                         / CAST(GREATEST(COUNT(*) - SUM(label), 1) AS DOUBLE))
                      * 1000000) AS BIGINT) AS prior
      FROM lab
    ),
    docsum AS (
      SELECT t.doc_id, SUM(w.w) AS s
      FROM tok t JOIN w USING (tok)
      GROUP BY t.doc_id
    )
    SELECT l.doc_id, CAST(l.label AS BIGINT) AS label,
           len(l.toks) AS n_tokens,
           CAST(COALESCE(d.s, 0) + pri.prior AS BIGINT) AS nb_micro,
           CAST(CASE WHEN COALESCE(d.s, 0) + pri.prior > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS pred
    FROM lab l LEFT JOIN docsum d USING (doc_id), pri
    ORDER BY l.doc_id
"""


def cdc_chunk_dedup_q(sf_dir: str):
    """Content-defined chunking dedup (`stages/cdc.py`): gear-rolling-
    hash chunk boundaries (FastCDC family) + cross-document duplicate-
    chunk accounting. Catches shared byte ranges that survive neither
    whole-doc nor aligned-k-gram dedup. Rows-only: the 64-byte rolling-
    hash chain is not SQL-expressible; pytest pins the kernel against
    an independent per-byte reference implementation and asserts
    parallelism-independence (`tests/test_cdc.py`)."""
    from nlshray.stages.cdc import cdc_chunk_dedup

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return cdc_chunk_dedup(docs, nparts=NPARTS).sort("doc_id")


QUERIES["cdc_chunk_dedup"] = cdc_chunk_dedup_q


def gopher_quality_filter(sf_dir: str):
    """The published Gopher quality rule set (Rae et al. 2021 §A1.1)
    per doc: word-count band, mean-word-length band, alphabetic-word
    fraction, stop-word hits, symbol-to-word ratio, and the repetition
    gates — each as an int flag plus the combined ``keep``. Signals
    from one vectorized Arrow pass (``gopher_rule_arrays``) plus the
    ``token_repetition_arrays`` kernel the ``repetition_stats`` oracle
    pins; thresholds are the paper's. All rule comparisons evaluate on
    the ROUNDED fractions so the SQL replay is bit-exact.
    """
    from nlshray.stages.textstats import (
        gopher_rule_arrays,
        token_repetition_arrays,
    )

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        g = gopher_rule_arrays(t["text"])
        r = token_repetition_arrays(t["text"])
        mean_len = _round_np(g["mean_word_len"], 6)
        alpha = _round_np(g["frac_alpha_words"], 6)
        sym = _round_np(g["symbol_ratio"], 6)
        top1 = _round_np(r["top_token_frac"], 6)
        top2 = _round_np(r["top_bigram_frac"], 6)
        n = g["n_words"]
        ok_words = (n >= 50) & (n <= 100_000)
        ok_mean = (mean_len >= 3.0) & (mean_len <= 10.0)
        ok_alpha = alpha >= 0.8
        ok_stop = g["n_stop_hits"] >= 2
        ok_sym = sym <= 0.1
        ok_rep = (top1 <= 0.2) & (top2 <= 0.18)
        keep = ok_words & ok_mean & ok_alpha & ok_stop & ok_sym & ok_rep
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n),
                "mean_word_len": pa.array(mean_len),
                "frac_alpha_words": pa.array(alpha),
                "n_stop_hits": pa.array(g["n_stop_hits"]),
                "symbol_ratio": pa.array(sym),
                "top_token_frac": pa.array(top1),
                "top_bigram_frac": pa.array(top2),
                "ok_words": pa.array(ok_words.astype(np.int64)),
                "ok_mean_len": pa.array(ok_mean.astype(np.int64)),
                "ok_alpha": pa.array(ok_alpha.astype(np.int64)),
                "ok_stop": pa.array(ok_stop.astype(np.int64)),
                "ok_symbol": pa.array(ok_sym.astype(np.int64)),
                "ok_repetition": pa.array(ok_rep.astype(np.int64)),
                "keep": pa.array(keep.astype(np.int64)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["gopher_quality_filter"] = gopher_quality_filter

ORACLE_SQL["gopher_quality_filter"] = """
    WITH tokarr AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    base AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
               AS sum_len,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
               AS n_alpha,
             CAST(len(list_filter(toks,
                 t -> t IN ('the','be','to','of','and','that','have','with')))
               AS BIGINT) AS n_stop_hits,
             (length(text) - length(replace(text, '#', '')))
               + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym
      FROM tokarr
    ),
    tok AS (SELECT doc_id, u.tok FROM tokarr, unnest(toks) AS u(tok)),
    per_tok AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
    ),
    per AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(max(c) AS BIGINT) AS max_tok
      FROM per_tok GROUP BY doc_id
    ),
    big AS (
      SELECT doc_id, u.bg
      FROM (
        SELECT doc_id,
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1]) AS bgs
        FROM tokarr
      ), unnest(bgs) AS u(bg)
    ),
    per_bg AS (
      SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
    ),
    perb AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(max(c) AS BIGINT) AS max_bg
      FROM per_bg GROUP BY doc_id
    ),
    sig AS (
      SELECT b.doc_id, b.n_words,
             round(CASE WHEN b.n_words > 0
                   THEN b.sum_len / CAST(b.n_words AS DOUBLE)
                   ELSE 0.0 END, 6) AS mean_word_len,
             round(CASE WHEN b.n_words > 0
                   THEN b.n_alpha / CAST(b.n_words AS DOUBLE)
                   ELSE 0.0 END, 6) AS frac_alpha_words,
             b.n_stop_hits,
             round(b.n_sym
                   / CAST(greatest(b.n_words, 1) AS DOUBLE), 6)
               AS symbol_ratio,
             round(CASE WHEN p.n_tokens > 0
                   THEN p.max_tok / CAST(p.n_tokens AS DOUBLE)
                   ELSE 0.0 END, 6) AS top_token_frac,
             round(CASE WHEN COALESCE(pb.n_bigrams, 0) > 0
                   THEN pb.max_bg / CAST(pb.n_bigrams AS DOUBLE)
                   ELSE 0.0 END, 6) AS top_bigram_frac
      FROM base b
      LEFT JOIN per p USING (doc_id)
      LEFT JOIN perb pb USING (doc_id)
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_hits,
           symbol_ratio, top_token_frac, top_bigram_frac,
           CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS ok_words,
           CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS BIGINT) AS ok_mean_len,
           CAST(frac_alpha_words >= 0.8 AS BIGINT) AS ok_alpha,
           CAST(n_stop_hits >= 2 AS BIGINT) AS ok_stop,
           CAST(symbol_ratio <= 0.1 AS BIGINT) AS ok_symbol,
           CAST(top_token_frac <= 0.2 AND top_bigram_frac <= 0.18 AS BIGINT)
             AS ok_repetition,
           CAST(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND frac_alpha_words >= 0.8
                AND n_stop_hits >= 2
                AND symbol_ratio <= 0.1
                AND top_token_frac <= 0.2
                AND top_bigram_frac <= 0.18 AS BIGINT) AS keep
    FROM sig
"""


@ray.remote
def _colsum_i64(t: pa.Table, col: str) -> int:
    return int(pc.sum(t[col]).as_py() or 0)


@ray.remote
def _pmi_score_shard(
    t: pa.Table, uni, n_tok: int, n_bg: int, min_count: int
) -> pa.Table:
    """Attach unigram counts + rounded PMI to one merged bigram shard."""
    from nlshray.hashing import hash_utf8_array

    keys, cnts = uni
    t = t.filter(pc.greater_equal(t["n_ab"], min_count))
    if len(t) == 0:
        return pa.table(
            {
                "word_a": pa.array([], pa.string()),
                "word_b": pa.array([], pa.string()),
                "n_ab": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "pmi": pa.array([], pa.float64()),
            }
        )
    wa = pc.split_pattern(t["bg"], " ").combine_chunks()
    flat = wa.flatten()
    h = hash_utf8_array(flat)
    pos = np.minimum(np.searchsorted(keys, h), len(keys) - 1)
    # every bigram constituent is by construction in the vocabulary
    cn = cnts[pos].reshape(-1, 2)
    n_ab = t["n_ab"].to_numpy().astype(np.float64)
    pmi = np.log(
        (n_ab / float(n_bg))
        / ((cn[:, 0] / float(n_tok)) * (cn[:, 1] / float(n_tok)))
    )
    words = flat.to_numpy(zero_copy_only=False).reshape(-1, 2)
    p = 10.0**6
    return pa.table(
        {
            "word_a": pa.array(words[:, 0], pa.string()),
            "word_b": pa.array(words[:, 1], pa.string()),
            "n_ab": t["n_ab"],
            "n_a": pa.array(cn[:, 0].astype(np.int64)),
            "n_b": pa.array(cn[:, 1].astype(np.int64)),
            "pmi": pa.array(np.round(pmi * p) / p),
        }
    )


def _bigram_partial(t: pa.Table) -> pa.Table:
    """One block's adjacent-bigram value_counts partial: (bg, n_ab)."""
    from nlshray.functions.shingles import _SPLIT_PATTERN

    arr = t["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.greater(pc.utf8_length(flat), 0)
    kept = flat.filter(keep)
    # per-doc counts of KEPT tokens (empty split artifacts dropped)
    per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    per_doc = per_doc.astype(np.int64)
    ends = np.cumsum(per_doc)
    ck = np.concatenate([[0], np.cumsum(keep.to_numpy(zero_copy_only=False))])
    counts = (ck[ends] - ck[ends - per_doc]).astype(np.int64)
    if len(kept) < 2:
        return pa.table(
            {"bg": pa.array([], pa.string()), "n_ab": pa.array([], pa.int64())}
        )
    from nlshray.functions.nputil import segment_ids

    doc = segment_ids(counts)
    valid = np.flatnonzero(doc[:-1] == doc[1:])
    if valid.shape[0] == 0:
        return pa.table(
            {"bg": pa.array([], pa.string()), "n_ab": pa.array([], pa.int64())}
        )
    a = kept.take(pa.array(valid))
    b = kept.take(pa.array(valid + 1))
    bg = pc.binary_join_element_wise(a, b, " ")
    vc = pc.value_counts(bg)
    return pa.table(
        {
            "bg": vc.field("values"),
            "n_ab": vc.field("counts").cast(pa.int64()),
        }
    )


def collocations_pmi(sf_dir: str, min_count: int = 5):
    """Corpus collocation mining: pointwise mutual information
    ``ln(p(ab) / (p(a) p(b)))`` for every adjacent-token bigram with
    corpus count >= ``min_count`` (``p(ab)`` over bigram instances,
    ``p(a)`` over token instances — the classic corpus-linguistics
    estimator, Church & Hanks 1990). Both count passes run the shared
    two-round hash exchange (``stages/exchange.py``) so only per-block
    ``value_counts`` partials move; the vocabulary table (Heaps-law
    small) broadcasts once via ``ray.put`` as sorted hash->count arrays
    and each merged bigram shard scores itself with one searchsorted —
    no join shuffle. Fully SQL-oracled (counts are integers; the one
    float is the rounded PMI, computed with an identical expression
    tree on both engines)."""
    from nlshray.hashing import hash_utf8_array
    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        utf8_key_hash,
    )

    docs = _pq(sf_dir, "documents", columns=["text"])
    refs = docs.to_arrow_refs()
    empty = pa.table(
        {
            "word_a": pa.array([], pa.string()),
            "word_b": pa.array([], pa.string()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )
    if not refs:
        return rd.from_arrow(empty)
    uni_refs = hash_exchange(
        refs,
        _vocab_partial,
        utf8_key_hash("tok"),
        grouped_sum_merge("tok", ["n"]),
        NPARTS,
    )
    bg_refs = hash_exchange(
        refs,
        _bigram_partial,
        utf8_key_hash("bg"),
        grouped_sum_merge("bg", ["n_ab"]),
        NPARTS,
    )
    uni = pa.concat_tables(ray.get(uni_refs))
    n_tok = int(pc.sum(uni["n"]).as_py() or 0)
    h = hash_utf8_array(uni["tok"])
    order = np.argsort(h)
    uni_ref = ray.put((h[order], uni["n"].to_numpy()[order]))
    n_bg = sum(ray.get([_colsum_i64.remote(r, "n_ab") for r in bg_refs]))
    if n_bg == 0 or n_tok == 0:
        return rd.from_arrow(empty)
    out = [
        _pmi_score_shard.remote(r, uni_ref, n_tok, n_bg, min_count)
        for r in bg_refs
    ]
    return rd.from_arrow_refs(out)


QUERIES["collocations_pmi"] = collocations_pmi

ORACLE_SQL["collocations_pmi"] = """
    WITH tokarr AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT u.tok FROM tokarr, unnest(toks) AS u(tok)),
    cu AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok),
    big AS (
      SELECT u.bg
      FROM (
        SELECT list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1]) AS bgs
        FROM tokarr
      ), unnest(bgs) AS u(bg)
    ),
    cb AS (SELECT bg, CAST(count(*) AS BIGINT) AS n_ab FROM big GROUP BY bg),
    tot AS (
      SELECT (SELECT sum(n) FROM cu) AS n_tok,
             (SELECT sum(n_ab) FROM cb) AS n_bg
    )
    SELECT split_part(bg, ' ', 1) AS word_a,
           split_part(bg, ' ', 2) AS word_b,
           n_ab, a.n AS n_a, b.n AS n_b,
           round(ln((n_ab / CAST(t.n_bg AS DOUBLE))
                    / ((a.n / CAST(t.n_tok AS DOUBLE))
                       * (b.n / CAST(t.n_tok AS DOUBLE)))), 6) AS pmi
    FROM cb
    JOIN cu a ON a.tok = split_part(bg, ' ', 1)
    JOIN cu b ON b.tok = split_part(bg, ' ', 2)
    CROSS JOIN tot t
    WHERE n_ab >= 5
"""


@ray.remote
def _src_totals(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()), "ns": pa.array([], pa.int64())}
        )
    g = pa.TableGroupBy(t, "source").aggregate([("n", "sum")])
    return g.rename_columns(["source", "ns"])


@ray.remote
def _jsd_shard(t: pa.Table, sources: list, totals: np.ndarray) -> pa.Table:
    """Per-source-pair JSD partial over one token shard: each token's
    contribution is quantized to integer micro-nats BEFORE summation,
    so cross-shard sums are order-independent and SQL-replayable."""
    S = len(sources)
    ia, ib = np.triu_indices(S, k=1)
    empty = pa.table(
        {
            "src_a": pa.array([sources[i] for i in ia], pa.string()),
            "src_b": pa.array([sources[j] for j in ib], pa.string()),
            "part": pa.array(np.zeros(ia.shape[0], np.int64)),
        }
    )
    if len(t) == 0:
        return empty
    sidx = pc.index_in(
        t["source"], value_set=pa.array(list(sources), pa.string())
    ).to_numpy(zero_copy_only=False)
    from nlshray.hashing import hash_utf8_array

    th = hash_utf8_array(t["tok"])
    _, tcode = np.unique(th, return_inverse=True)
    V = int(tcode.max()) + 1
    mat = np.zeros((V, S), np.int64)
    mat[tcode, sidx.astype(np.int64)] = t["n"].to_numpy()
    p = mat / totals[None, :].astype(np.float64)
    parts = np.zeros(ia.shape[0], np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(ia.shape[0]):
            pp, qq = p[:, ia[k]], p[:, ib[k]]
            m = pp + qq
            tp = np.where(pp > 0, pp * np.log(2 * pp / m), 0.0)
            tq = np.where(qq > 0, qq * np.log(2 * qq / m), 0.0)
            c = np.round(1e6 * (0.5 * tp + 0.5 * tq)).astype(np.int64)
            parts[k] = c.sum()
    return pa.table(
        {
            "src_a": empty["src_a"],
            "src_b": empty["src_b"],
            "part": pa.array(parts),
        }
    )


def _src_tok_partial(t: pa.Table) -> pa.Table:
    """One block's (source, token) value_counts partial."""
    from nlshray.functions.shingles import _SPLIT_PATTERN

    arr = t["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.greater(pc.utf8_length(flat), 0)
    kept = flat.filter(keep)
    per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    per_doc = per_doc.astype(np.int64)
    ends = np.cumsum(per_doc)
    ck = np.concatenate([[0], np.cumsum(keep.to_numpy(zero_copy_only=False))])
    counts = (ck[ends] - ck[ends - per_doc]).astype(np.int64)
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    src_rep = pa.array(np.repeat(src, counts), pa.string())
    combined = pc.binary_join_element_wise(src_rep, kept, "\x1f")
    vc = pc.value_counts(combined)
    halves = pc.split_pattern(vc.field("values"), "\x1f")
    if isinstance(halves, pa.ChunkedArray):
        halves = halves.combine_chunks()
    return pa.table(
        {
            "tok": pc.list_element(halves, 1),
            "source": pc.list_element(halves, 0),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


def source_divergence_jsd(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between every two sources'
    token distributions — the data-mix diagnostic a curator reads
    before weighting provenances (0 = identical unigram profiles,
    ln 2 = disjoint). One (source, token) count exchange sharded by
    TOKEN (a shard holds every source's count for its tokens, so the
    per-pair, per-token contribution is computable shard-locally);
    contributions are quantized to integer micro-nats per term
    (``stages/lm.py``'s exactness trick), so the cross-shard sum is
    order-independent and the whole computation replays bit-exactly in
    SQL. Scale shape: O(V/P x S^2) flops per shard, only count partials
    and 190-row pair tables ever move. Uses the JSD definition of
    ``functions/distances.py`` (the reference's own metric family)."""
    from nlshray.stages.exchange import hash_exchange, utf8_key_hash

    docs = _pq(sf_dir, "documents", columns=["text", "source"])
    refs = docs.to_arrow_refs()
    empty = pa.table(
        {
            "src_a": pa.array([], pa.string()),
            "src_b": pa.array([], pa.string()),
            "jsd_micro": pa.array([], pa.int64()),
            "jsd": pa.array([], pa.float64()),
        }
    )
    if not refs:
        return rd.from_arrow(empty)

    def merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select(["tok", "source", "n"])
        g = pa.TableGroupBy(t, ["tok", "source"]).aggregate([("n", "sum")])
        return g.rename_columns(["tok", "source", "n"])

    shards = hash_exchange(
        refs, _src_tok_partial, utf8_key_hash("tok"), merge, NPARTS
    )
    tot = pa.concat_tables(ray.get([_src_totals.remote(r) for r in shards]))
    if len(tot) == 0:
        return rd.from_arrow(empty)
    g = pa.TableGroupBy(tot, "source").aggregate([("ns", "sum")])
    srcs = sorted(g["source"].to_pylist())
    ns = dict(zip(g["source"].to_pylist(), g["ns_sum"].to_pylist()))
    totals = np.array([ns[s] for s in srcs], np.int64)
    parts = pa.concat_tables(
        ray.get([_jsd_shard.remote(r, srcs, totals) for r in shards])
    )
    gg = pa.TableGroupBy(parts, ["src_a", "src_b"]).aggregate([("part", "sum")])
    micro = gg["part_sum"].to_numpy().astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "src_a": gg["src_a"],
                "src_b": gg["src_b"],
                "jsd_micro": pa.array(micro),
                "jsd": pa.array(micro / 1000000.0),
            }
        )
    )


QUERIES["source_divergence_jsd"] = source_divergence_jsd

ORACLE_SQL["source_divergence_jsd"] = """
    WITH tok AS (
      SELECT source, u.tok FROM (
        SELECT source,
               list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                           t -> t <> '') AS toks
        FROM documents
      ), unnest(toks) AS u(tok)
    ),
    cnt AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY source, tok
    ),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cnt GROUP BY source),
    pairs AS (
      SELECT a.source AS sa, a.ns AS na, b.source AS sb, b.ns AS nb
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    vocab AS (SELECT DISTINCT tok FROM cnt),
    terms AS (
      SELECT p.sa, p.sb,
             COALESCE(ca.n, 0) / CAST(p.na AS DOUBLE) AS pp,
             COALESCE(cb.n, 0) / CAST(p.nb AS DOUBLE) AS qq
      FROM pairs p
      CROSS JOIN vocab v
      LEFT JOIN cnt ca ON ca.source = p.sa AND ca.tok = v.tok
      LEFT JOIN cnt cb ON cb.source = p.sb AND cb.tok = v.tok
      WHERE COALESCE(ca.n, 0) + COALESCE(cb.n, 0) > 0
    ),
    term_q AS (
      SELECT sa, sb,
             CAST(round(1e6 * (
               0.5 * (CASE WHEN pp > 0
                           THEN pp * ln(2 * pp / (pp + qq)) ELSE 0 END)
               + 0.5 * (CASE WHEN qq > 0
                             THEN qq * ln(2 * qq / (pp + qq)) ELSE 0 END)
             )) AS BIGINT) AS c
      FROM terms
    )
    SELECT sa AS src_a, sb AS src_b,
           CAST(sum(c) AS BIGINT) AS jsd_micro,
           sum(c) / 1000000.0 AS jsd
    FROM term_q GROUP BY sa, sb
"""


DSIR_BUCKETS = 256
DSIR_POS_SOURCES = ("src0", "src1", "src2", "src3")


def dsir_resampled(sf_dir: str):
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hash every token
    occurrence into ``DSIR_BUCKETS`` feature buckets, fit add-1-smoothed
    bucket distributions for the TARGET slice (trusted provenances,
    same deterministic rule as ``nb_quality_scores``) and for the RAW
    crawl (all docs), and score each doc by the summed per-occurrence
    log importance ratio ``ln p_target(b) - ln p_raw(b)`` in integer
    micro-nats (order-independent sums — the ``stages/lm.py`` trick).
    ``selected`` keeps docs whose evidence says more-target-than-raw
    (score > 0); the paper's top-k resampling variant is this score
    composed with the repo's quantile/top-k operators. The hashing
    trick (bucket collisions are SEMANTIC, not incidental) is why the
    oracle replays the poly-fold -> splitmix -> ``% B`` chain in SQL
    rather than grouping token strings.

    Scale shape: bucket-count partials are <= B rows per block (driver-
    merged like the CMS sketches); the dense B-int weight vector ships
    once per task; scoring is one segment-sum pass. Nothing shuffles.
    """
    from nlshray.functions.shingles import batch_token_hashes

    B = DSIR_BUCKETS
    pos = set(DSIR_POS_SOURCES)
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def part(t: pa.Table) -> pa.Table:
        flat, counts = batch_token_hashes(t["text"], seed=CFG.seed)
        b = (flat % np.uint64(B)).astype(np.int64)
        is_t = pc.is_in(
            t["source"], value_set=pa.array(sorted(pos), pa.string())
        ).to_numpy(zero_copy_only=False)
        occ_t = np.repeat(is_t, counts)
        na = np.bincount(b, minlength=B)
        nt = np.bincount(b[occ_t], minlength=B)
        return pa.table(
            {
                "b": pa.array(np.arange(B, dtype=np.int64)),
                "nt": pa.array(nt.astype(np.int64)),
                "na": pa.array(na.astype(np.int64)),
            }
        )

    partials = _gather_partials(
        docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ("b", "nt", "na"),
    )
    if partials is None:
        partials = pa.table(
            {"b": pa.array([], pa.int64()), "nt": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64())}
        )
    g = pa.TableGroupBy(partials, "b").aggregate([("nt", "sum"), ("na", "sum")])
    nt = np.zeros(B, np.int64)
    na = np.zeros(B, np.int64)
    bidx = g["b"].to_numpy()
    nt[bidx] = g["nt_sum"].to_numpy()
    na[bidx] = g["na_sum"].to_numpy()
    Nt, Na = int(nt.sum()), int(na.sum())
    w = np.round(
        1e6
        * (
            np.log((nt + 1) / float(Nt + B))
            - np.log((na + 1) / float(Na + B))
        )
    ).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        flat, counts = batch_token_hashes(t["text"], seed=CFG.seed)
        occ_w = w[(flat % np.uint64(B)).astype(np.int64)]
        ends = np.cumsum(counts)
        cs = np.concatenate([[0], np.cumsum(occ_w)])
        s = cs[ends] - cs[ends - counts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_feats": pa.array(counts.astype(np.int64)),
                "dsir_micro": pa.array(s.astype(np.int64)),
                "selected": pa.array((s > 0).astype(np.int64)),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["dsir_resampled"] = dsir_resampled


def _build_dsir_oracle() -> str:
    """Replays the DSIR chain in SQL: token poly-fold -> seed xor ->
    splitmix64 -> ``% B`` bucket, target/raw bucket counts, add-1
    micro-nat weights, per-doc integer sums."""
    from nlshray.hashing import _seed_mix

    seedmix = int(_seed_mix(CFG.seed))
    B = DSIR_BUCKETS
    srcs = ", ".join(f"'{s}'" for s in sorted(DSIR_POS_SOURCES))
    return f"""
        WITH toks AS (
          SELECT d.doc_id, t.tok
          FROM documents d,
               unnest(regexp_split_to_array(lower(d.text), '[^0-9a-z_]+')) AS t(tok)
          WHERE t.tok <> ''
        ),
        folded AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(regexp_split_to_array(tok, ''),
                               c -> unicode(c)::HUGEINT)),
              (acc, c) -> (acc * {_SQL_POLY} + c) % {_M64}
            ) AS raw
          FROM toks
        ),
        seeded AS (SELECT doc_id, xor(CAST(raw AS UBIGINT), {seedmix}::UBIGINT) AS x FROM folded),
        {_sql_splitmix('s', 'seeded', 'x', '').strip()},
        occ AS (SELECT doc_id, CAST(z % {B} AS BIGINT) AS b FROM s6),
        lab AS (SELECT doc_id, source IN ({srcs}) AS is_t FROM documents),
        cnt AS (
          SELECT b,
                 CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                 CAST(count(*) AS BIGINT) AS na
          FROM occ JOIN lab USING (doc_id) GROUP BY b
        ),
        tot AS (SELECT sum(nt) AS tnt, sum(na) AS tna FROM cnt),
        w AS (
          SELECT b,
                 CAST(round(1e6 * (
                   ln((nt + 1) / CAST(tnt + {B} AS DOUBLE))
                   - ln((na + 1) / CAST(tna + {B} AS DOUBLE))
                 )) AS BIGINT) AS w
          FROM cnt CROSS JOIN tot
        ),
        docsum AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(sum(w) AS BIGINT) AS s
          FROM occ JOIN w USING (b) GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(ds.n_feats, 0) AS n_feats,
               COALESCE(ds.s, 0) AS dsir_micro,
               CAST(COALESCE(ds.s, 0) > 0 AS BIGINT) AS selected
        FROM documents d LEFT JOIN docsum ds USING (doc_id)
    """


ORACLE_SQL["dsir_resampled"] = _build_dsir_oracle()


def embedding_kmeans(sf_dir: str, k: int = 8):
    """Full-corpus distributed spherical k-means over the embeddings
    table (``stages/kmeans.py``): per-round task partials (k x d
    fixed-point cluster sums) against a broadcast centroid matrix,
    driver does only the k x d reduce. Rows-only by design (iterative —
    not SQL-expressible); pytest pins bit-equality against a direct
    single-process numpy Lloyd's and across partitionings."""
    from nlshray.stages.kmeans import kmeans_embeddings

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ds, _ = kmeans_embeddings(emb, k=k, n_iters=10, seed=CFG.seed)
    return ds


QUERIES["embedding_kmeans"] = embedding_kmeans


def _cohort_partial(t: pa.Table) -> pa.Table:
    """Block-local (user_id, day, min ts) rows."""
    day = pc.strftime(t["ts"], format="%Y-%m-%d")
    tbl = pa.table({"user_id": t["user_id"], "day": day, "ts_min": t["ts"]})
    g = pa.TableGroupBy(tbl, ["user_id", "day"]).aggregate([("ts_min", "min")])
    return g.rename_columns(["user_id", "day", "ts_min"])


def _cohort_merge(t: pa.Table) -> pa.Table:
    """Exact per-shard cohort cells: the shard holds EVERY row of its
    users, so first-event day and the distinct active-day set are
    both shard-local facts; only (cohort_day, day, n) counts leave."""
    if len(t) == 0:
        return pa.table(
            {
                "cohort_day": pa.array([], pa.string()),
                "day": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    g = pa.TableGroupBy(t, ["user_id", "day"]).aggregate([("ts_min", "min")])
    uid = g["user_id"].to_numpy()
    ts = g["ts_min_min"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    days = np.asarray(g["day"].to_pylist(), dtype=object)
    uniq, inv = np.unique(uid, return_inverse=True)
    order = np.lexsort((ts, inv))
    inv_o = inv[order]
    first_pos = np.flatnonzero(np.append(True, inv_o[1:] != inv_o[:-1]))
    first_row = np.empty(uniq.shape[0], np.int64)
    first_row[inv_o[first_pos]] = order[first_pos]
    cohort = days[first_row][inv]
    cell = pa.table(
        {
            "cohort_day": pa.array(list(cohort), pa.string()),
            "day": pa.array(list(days), pa.string()),
        }
    )
    cg = pa.TableGroupBy(cell, ["cohort_day", "day"]).aggregate(
        [([], "count_all")]
    )
    return cg.rename_columns(["cohort_day", "day", "n"])


def user_retention_cohorts(sf_dir: str):
    """Cohort retention matrix over the events stream: users are
    cohorted by the DAY of their first event; each (cohort_day,
    day) cell counts the cohort's users active that day — the
    standard product-analytics retention table. One hash exchange
    keyed by user_id (``stages/exchange.py``): after the merge a shard
    holds every (user, day, min ts) row for its users, so cohort
    assignment and the distinct-day set are computed shard-locally
    and only tiny count cells move. Fully SQL-oracled."""
    from nlshray.stages.exchange import hash_exchange, int64_key_hash

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"])
    refs = ev.to_arrow_refs()
    if not refs:
        return rd.from_arrow(
            pa.table(
                {
                    "cohort_day": pa.array([], pa.string()),
                    "day": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        )
    shards = hash_exchange(
        refs, _cohort_partial, int64_key_hash("user_id"), _cohort_merge, NPARTS
    )
    cells = pa.concat_tables(ray.get(shards))
    g = pa.TableGroupBy(cells, ["cohort_day", "day"]).aggregate([("n", "sum")])
    return rd.from_arrow(g.rename_columns(["cohort_day", "day", "n_users"]))


QUERIES["user_retention_cohorts"] = user_retention_cohorts

ORACLE_SQL["user_retention_cohorts"] = """
    WITH fe AS (
      SELECT user_id, strftime(min(ts), '%Y-%m-%d') AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events)
    SELECT f.cohort_day, a.day, CAST(count(*) AS BIGINT) AS n_users
    FROM act a JOIN fe f USING (user_id)
    GROUP BY f.cohort_day, a.day
"""


def events_anomaly(sf_dir: str):
    """Per-user rolling z-score anomaly flags over the event stream
    (``stages/window.rolling_anomaly``): each event tested against the
    mean/variance of the user's preceding 20 events. The z-test runs in
    rearranged integer arithmetic (no division, no float), so the SQL
    window-frame oracle replays it bit-exactly."""
    from nlshray.stages.window import rolling_anomaly

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return rolling_anomaly(
        ds,
        key="user_id",
        ts="ts",
        value="value",
        id_col="event_id",
        window=20,
        min_n=5,
        k=3,
        num_partitions=NPARTS,
    )


QUERIES["events_anomaly"] = events_anomaly

ORACLE_SQL["events_anomaly"] = """
    WITH q AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 10000) AS BIGINT) AS vq
      FROM events
    ),
    w AS (
      SELECT event_id, vq,
             COUNT(vq) OVER win AS n_prev,
             COALESCE(SUM(vq) OVER win, 0) AS sum_prev,
             COALESCE(SUM(vq * vq) OVER win, 0) AS sumsq_prev
      FROM q
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id,
           CAST(n_prev AS BIGINT) AS n_prev,
           CAST(sum_prev AS BIGINT) AS sum_prev_q,
           CAST(sumsq_prev AS BIGINT) AS sumsq_prev_q,
           CAST(CASE WHEN n_prev >= 5
                      AND (n_prev * vq - sum_prev) * (n_prev * vq - sum_prev)
                          > 9 * (n_prev * sumsq_prev - sum_prev * sum_prev)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM w
"""


def knn_graph(sf_dir: str, k: int = 5):
    """Exact kNN GRAPH over the embeddings table: every vector's top-k
    cosine neighbors (the self-join variant of ``knn_cosine``) — the
    build step of graph-based dedup/diversity pipelines and the ground
    truth for the approximate members. Brute blocked self-join: the
    (sorted-by-id) corpus matrix broadcasts once and every block scores
    itself against it with one matmul — the exact O(n^2) baseline; at
    corpus scales where that is impossible the IVF/HNSW members are the
    approximate graph-build path. Deterministic ties (sim DESC, id ASC)
    and SQL-oracled like ``knn_cosine``."""
    from nlshray.stages.ann import gather_matrix, knn_bruteforce

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids, X = gather_matrix(emb)
    order = np.argsort(ids)
    out = knn_bruteforce(emb, X[order], ids[order], k=k)
    return _round(to_arrow(out), {"sim": 6})


QUERIES["knn_graph"] = knn_graph

ORACLE_SQL["knn_graph"] = """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings
    )
    SELECT query_id, vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])), 6) AS sim
    FROM q, embeddings
    WHERE vec_id != query_id
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) DESC,
                 vec_id
    ) <= 5
"""


def mixture_weights(sf_dir: str, alpha: float = 0.3):
    """Temperature-scaled data-mix sampling weights per source:
    ``w_s = n_s^alpha / sum_t n_t^alpha`` with alpha = 0.3 — the
    multilingual/multi-source rebalancing rule of public LLM data work
    (temperature sampling, Conneau & Lample 2019; data-mix weighting in
    GPT-3/Gopher appendices). Token counts come from per-block combiner
    partials (the ``source_summary`` shape); the pow terms quantize to
    integer micro-units before the normalizing sum (order-independent,
    SQL-replayable). Upsampling factor ``boost = w_s / raw share`` > 1
    marks under-represented sources."""
    from nlshray.functions.shingles import batch_token_hashes

    docs = _pq(sf_dir, "documents", columns=["text", "source"])

    def part(t: pa.Table) -> pa.Table:
        _, counts = batch_token_hashes(t["text"])
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        srcs, inv = np.unique(src, return_inverse=True)
        tok = np.zeros(srcs.shape[0], np.int64)
        np.add.at(tok, inv, counts.astype(np.int64))
        return pa.table(
            {
                "source": pa.array(list(srcs), pa.string()),
                "n_tokens": pa.array(tok),
                "n_docs": pa.array(
                    np.bincount(inv, minlength=srcs.shape[0]).astype(np.int64)
                ),
            }
        )

    partials = _gather_partials(
        docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ("source", "n_tokens", "n_docs"),
    )
    if partials is None:
        partials = pa.table(
            {"source": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "n_docs": pa.array([], pa.int64())}
        )
    g = pa.TableGroupBy(partials, "source").aggregate(
        [("n_tokens", "sum"), ("n_docs", "sum")]
    )
    n = g["n_tokens_sum"].to_numpy().astype(np.float64)
    pq_ = np.round(1e6 * n**alpha).astype(np.int64)
    tot_p = int(pq_.sum())
    tot_n = int(n.sum())
    w = _round_np(pq_ / float(tot_p), 6)
    share = _round_np(n / float(tot_n), 6)
    boost = _round_np((pq_ / float(tot_p)) / (n / float(tot_n)), 6)
    return rd.from_arrow(
        pa.table(
            {
                "source": g["source"],
                "n_docs": g["n_docs_sum"],
                "n_tokens": g["n_tokens_sum"],
                "raw_share": pa.array(share),
                "weight": pa.array(w),
                "boost": pa.array(boost),
            }
        )
    )


QUERIES["mixture_weights"] = mixture_weights

ORACLE_SQL["mixture_weights"] = """
    WITH tokc AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(
               regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
               t -> t <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, n_docs, n_tokens,
             CAST(round(1e6 * pow(CAST(n_tokens AS DOUBLE), 0.3)) AS BIGINT)
               AS pq
      FROM tokc
    ),
    tot AS (SELECT sum(pq) AS tp, sum(n_tokens) AS tn FROM p)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / CAST(t.tn AS DOUBLE), 6) AS raw_share,
           round(pq / CAST(t.tp AS DOUBLE), 6) AS weight,
           round((pq / CAST(t.tp AS DOUBLE))
                 / (n_tokens / CAST(t.tn AS DOUBLE)), 6) AS boost
    FROM p CROSS JOIN tot t
"""


def events_markov_transitions(sf_dir: str):
    """User-journey Markov model: the event-type transition matrix
    ``(from_type, to_type) -> count, P(to|from)`` over every user's
    chronologically adjacent event pair — the behavioral-analytics
    member of the events family. One groupby(user) shuffle (transitions
    need the user's global order), segmented LEAD kernel per group,
    per-block partial counts, tiny k^2 driver merge. Probabilities are
    rounded like every oracled float."""
    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def trans(t: pa.Table) -> pa.Table:
        us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((ids, us))
        s = et[order]
        if s.shape[0] < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pair = pa.table(
            {
                "from_type": pa.array(list(s[:-1]), pa.string()),
                "to_type": pa.array(list(s[1:]), pa.string()),
            }
        )
        g = pa.TableGroupBy(pair, ["from_type", "to_type"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["from_type", "to_type", "n"])

    def block_sum(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "from_type" not in t.schema.names:
            return pa.table(
                {"from_type": pa.array([], pa.string()),
                 "to_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        g = pa.TableGroupBy(t, ["from_type", "to_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["from_type", "to_type", "n"])

    parts = (
        ev.groupby("user_id", num_partitions=NPARTS)
        .map_groups(trans, batch_format="pyarrow")
        .map_batches(block_sum, batch_format="pyarrow", zero_copy_batch=True)
    )
    tot = pa.concat_tables(
        [b for b in parts.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    if len(tot) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "prob": pa.array([], pa.float64()),
                }
            )
        )
    g = pa.TableGroupBy(tot, ["from_type", "to_type"]).aggregate([("n", "sum")])
    n = g["n_sum"].to_numpy().astype(np.int64)
    ft = np.asarray(g["from_type"].to_pylist(), dtype=object)
    row_tot = {}
    for f, c in zip(ft, n):
        row_tot[f] = row_tot.get(f, 0) + int(c)
    denom = np.array([row_tot[f] for f in ft], np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "from_type": g["from_type"],
                "to_type": g["to_type"],
                "n": pa.array(n),
                "prob": pa.array(_round_np(n / denom, 6)),
            }
        )
    )


QUERIES["events_markov_transitions"] = events_markov_transitions

ORACLE_SQL["events_markov_transitions"] = """
    WITH o AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, nxt AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           round(c.n / CAST(t.tot AS DOUBLE), 6) AS prob
    FROM c JOIN t USING (from_type)
"""


@ray.remote
def _entropy_shard(t: pa.Table, sources: list, totals: np.ndarray) -> pa.Table:
    """Per-source entropy partial over one token shard (terms quantized
    to integer micro-nats before summation — order-independent)."""
    S = len(sources)
    out_vocab = np.zeros(S, np.int64)
    out_h = np.zeros(S, np.int64)
    if len(t):
        sidx = pc.index_in(
            t["source"], value_set=pa.array(list(sources), pa.string())
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy().astype(np.float64)
        p = n / totals[sidx].astype(np.float64)
        term = np.round(1e6 * (p * np.log(p))).astype(np.int64)
        np.add.at(out_h, sidx, term)
        np.add.at(out_vocab, sidx, 1)
    return pa.table(
        {
            "source": pa.array(list(sources), pa.string()),
            "vocab": pa.array(out_vocab),
            "h_part": pa.array(out_h),
        }
    )


def source_token_entropy(sf_dir: str):
    """Per-source unigram entropy (how lexically diverse each
    provenance is — the single-distribution companion of
    ``source_divergence_jsd``, same token-sharded count exchange, same
    per-term integer micro-nat quantization): ``H_s = -sum p ln p``
    over the source's token distribution, plus its vocabulary size and
    token volume. Fully SQL-oracled."""
    from nlshray.stages.exchange import hash_exchange, utf8_key_hash

    docs = _pq(sf_dir, "documents", columns=["text", "source"])
    refs = docs.to_arrow_refs()
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "vocab": pa.array([], pa.int64()),
            "entropy_micro": pa.array([], pa.int64()),
            "entropy": pa.array([], pa.float64()),
        }
    )
    if not refs:
        return rd.from_arrow(empty)

    def merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select(["tok", "source", "n"])
        g = pa.TableGroupBy(t, ["tok", "source"]).aggregate([("n", "sum")])
        return g.rename_columns(["tok", "source", "n"])

    shards = hash_exchange(
        refs, _src_tok_partial, utf8_key_hash("tok"), merge, NPARTS
    )
    tot = pa.concat_tables(ray.get([_src_totals.remote(r) for r in shards]))
    if len(tot) == 0:
        return rd.from_arrow(empty)
    g = pa.TableGroupBy(tot, "source").aggregate([("ns", "sum")])
    srcs = sorted(g["source"].to_pylist())
    ns = dict(zip(g["source"].to_pylist(), g["ns_sum"].to_pylist()))
    totals = np.array([ns[s] for s in srcs], np.int64)
    parts = pa.concat_tables(
        ray.get([_entropy_shard.remote(r, srcs, totals) for r in shards])
    )
    gg = pa.TableGroupBy(parts, "source").aggregate(
        [("vocab", "sum"), ("h_part", "sum")]
    )
    order = pc.sort_indices(gg, sort_keys=[("source", "ascending")])
    gg = gg.take(order)
    h = -gg["h_part_sum"].to_numpy().astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "source": gg["source"],
                "n_tokens": pa.array(totals),
                "vocab": gg["vocab_sum"],
                "entropy_micro": pa.array(h),
                "entropy": pa.array(h / 1000000.0),
            }
        )
    )


QUERIES["source_token_entropy"] = source_token_entropy

ORACLE_SQL["source_token_entropy"] = """
    WITH tok AS (
      SELECT source, u.tok FROM (
        SELECT source,
               list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                           t -> t <> '') AS toks
        FROM documents
      ), unnest(toks) AS u(tok)
    ),
    cnt AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY source, tok
    ),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cnt GROUP BY source),
    term AS (
      SELECT c.source,
             CAST(round(1e6 * ((c.n / CAST(t.ns AS DOUBLE))
                   * ln(c.n / CAST(t.ns AS DOUBLE)))) AS BIGINT) AS q
      FROM cnt c JOIN tot t USING (source)
    )
    SELECT t.source, t.ns AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(-sum(q) AS BIGINT) AS entropy_micro,
           -sum(q) / 1000000.0 AS entropy
    FROM term JOIN tot t USING (source)
    GROUP BY t.source, t.ns
"""


def _order_part_partial(t: pa.Table) -> pa.Table:
    """Block-local distinct (l_orderkey, l_partkey) rows."""
    g = pa.TableGroupBy(t, ["l_orderkey", "l_partkey"]).aggregate(
        [([], "count_all")]
    )
    return g.select(["l_orderkey", "l_partkey"])


def _pair_gen_merge(t: pa.Table) -> pa.Table:
    """Per-shard pair generation: the shard holds EVERY lineitem of its
    orders, so within-order part pairs are shard-local. Distinct parts
    per order, sorted; pairs emitted by the bounded-lag sweep (one
    vectorized pass per lag d — max basket size bounds d), each with a
    partial count."""
    if len(t) == 0:
        return pa.table(
            {
                "part_a": pa.array([], pa.int64()),
                "part_b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    g = pa.TableGroupBy(t, ["l_orderkey", "l_partkey"]).aggregate(
        [([], "count_all")]
    )
    ok = g["l_orderkey"].to_numpy()
    pk = g["l_partkey"].to_numpy()
    order = np.lexsort((pk, ok))
    ok, pk = ok[order], pk[order]
    pas, pbs = [], []
    n = ok.shape[0]
    d = 1
    while True:
        same = ok[: n - d] == ok[d:] if d < n else np.zeros(0, bool)
        if not same.any():
            break
        idx = np.flatnonzero(same)
        pas.append(pk[idx])
        pbs.append(pk[idx + d])
        d += 1
    if not pas:
        return pa.table(
            {
                "part_a": pa.array([], pa.int64()),
                "part_b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    pair = pa.table(
        {
            "part_a": pa.array(np.concatenate(pas)),
            "part_b": pa.array(np.concatenate(pbs)),
        }
    )
    cg = pa.TableGroupBy(pair, ["part_a", "part_b"]).aggregate(
        [([], "count_all")]
    )
    return cg.rename_columns(["part_a", "part_b", "n"])


def part_pair_support(sf_dir: str, min_support: int = 2):
    """Market-basket pair mining over lineitem: every part pair
    co-occurring in >= ``min_support`` distinct orders (the 2-itemset
    stage of Apriori/FP-growth — 'bought-together' analytics). Two
    chained hash exchanges (``stages/exchange.py``): the first
    co-locates orders (shard-local within-order pair generation via a
    bounded-lag sweep — basket size bounds the lag), the second counts
    pairs in pair-key space with the exact >= min_support filter inside
    the merge (a shard holds COMPLETE global counts for its pairs, so
    sub-threshold pairs never leave their shard). Fully SQL-oracled."""
    from nlshray.hashing import splitmix64
    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        int64_key_hash,
    )

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    refs = li.to_arrow_refs()
    empty = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
        }
    )
    if not refs:
        return rd.from_arrow(empty)
    pair_parts = hash_exchange(
        refs,
        _order_part_partial,
        int64_key_hash("l_orderkey"),
        _pair_gen_merge,
        NPARTS,
    )

    def pair_key(t: pa.Table) -> np.ndarray:
        a = t["part_a"].to_numpy().view(np.uint64)
        b = t["part_b"].to_numpy().view(np.uint64)
        return splitmix64(a ^ splitmix64(b))

    base = grouped_sum_merge("part_a", ["n"])

    def count_merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select(["part_a", "part_b", "n"])
        g = pa.TableGroupBy(t, ["part_a", "part_b"]).aggregate([("n", "sum")])
        g = g.rename_columns(["part_a", "part_b", "n"])
        return g.filter(pc.greater_equal(g["n"], min_support))

    out = hash_exchange(
        pair_parts, _identity_partial, pair_key, count_merge, NPARTS
    )
    tbl = pa.concat_tables(ray.get(out))
    if len(tbl) == 0:
        return rd.from_arrow(empty)
    return rd.from_arrow(tbl.rename_columns(["part_a", "part_b", "n_orders"]))


def _identity_partial(t: pa.Table) -> pa.Table:
    return t


QUERIES["part_pair_support"] = part_pair_support

ORACLE_SQL["part_pair_support"] = """
    WITH p AS (
      SELECT DISTINCT a.l_orderkey, a.l_partkey AS part_a,
             b.l_partkey AS part_b
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
    FROM p GROUP BY part_a, part_b
    HAVING count(*) >= 2
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: predicate-pushdown scan + one global aggregate —
    ``sum(extendedprice * discount)`` over a shipdate-year/discount-band/
    quantity filter. The float product quantizes per term to integer
    micro-units (``round(1e4*price) * round(100*disc)`` — both exact
    cent/percent values), so the global sum is order-independent and the
    SQL replay is bit-exact. The canonical 'filter + single reduction'
    streaming query: nothing shuffles, one partial per block."""
    li = _pq(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def part(t: pa.Table) -> pa.Table:
        ship = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
        )
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        dq = np.round(disc * 100.0).astype(np.int64)
        keep = (
            (ship >= np.datetime64("1996-01-01"))
            & (ship < np.datetime64("1997-01-01"))
            & (dq >= 5)
            & (dq <= 7)
            & (qty < 24)
        )
        pq_ = np.round(price[keep] * 10000.0).astype(np.int64)
        rev = int((pq_ * dq[keep]).sum())
        return pa.table(
            {
                "rev_part": pa.array([rev], pa.int64()),
                "n_part": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    parts = _gather_partials(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ("rev_part", "n_part"),
    )
    if parts is None:
        parts = pa.table(
            {"rev_part": pa.array([], pa.int64()),
             "n_part": pa.array([], pa.int64())}
        )
    micro = int(pc.sum(parts["rev_part"]).as_py() or 0)
    return rd.from_arrow(
        pa.table(
            {
                "revenue_micro": pa.array([micro], pa.int64()),
                "revenue": pa.array([micro / 1000000.0]),
                "n_items": pa.array(
                    [int(pc.sum(parts["n_part"]).as_py() or 0)], pa.int64()
                ),
            }
        )
    )


QUERIES["q6_forecast_revenue"] = q6_forecast_revenue

ORACLE_SQL["q6_forecast_revenue"] = """
    WITH q AS (
      SELECT CAST(round(l_extendedprice * 10000) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT) AS term
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
        AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        AND l_quantity < 24
    )
    SELECT CAST(COALESCE(sum(term), 0) AS BIGINT) AS revenue_micro,
           COALESCE(sum(term), 0) / 1000000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM q
"""


def q3_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape: customer (dim filter) -> orders (broadcast
    semi-join) -> lineitem (big fact) -> per-order revenue aggregate ->
    top-k. The BUILDING-segment custkeys and the qualifying orderkeys
    broadcast via ``ray.put`` (classic small-side broadcast instead of a
    shuffle join); revenue terms quantize to integer micro-units so the
    per-order sums are order-independent; top-k via one driver combine
    of per-block partial top-k (grouped-top-k shape). Fully
    SQL-oracled, NTILE-free deterministic ordering."""
    cutoff = np.datetime64("1998-01-01")
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def ckeys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["c_mktsegment"], "BUILDING")
        return t.filter(m).select(["c_custkey"])

    ck = _gather_partials(
        cust.map_batches(ckeys, batch_format="pyarrow", zero_copy_batch=True),
        ("c_custkey",),
    )
    ckv = ck["c_custkey"].to_numpy() if ck is not None else np.empty(0, np.int64)
    ck_ref = ray.put(np.sort(ckv))

    orders = _pq(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def okeys(t: pa.Table, ckr=ck_ref) -> pa.Table:
        keys = ray.get(ckr) if isinstance(ckr, ray.ObjectRef) else ckr
        oc = t["o_custkey"].to_numpy()
        od = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
        )
        if keys.shape[0] == 0:
            hit = np.zeros(oc.shape[0], bool)
        else:
            pos = np.searchsorted(keys, oc)
            hit = (pos < keys.shape[0]) & (
                keys[np.minimum(pos, keys.shape[0] - 1)] == oc
            )
        m = hit & (od < cutoff)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(pa.array(m)),
                "o_orderdate": pa.array(od[m].astype("datetime64[us]")),
            }
        )

    ot = _gather_partials(
        orders.map_batches(okeys, batch_format="pyarrow", zero_copy_batch=True),
        ("o_orderkey", "o_orderdate"),
    )
    if ot is None:
        ot = pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us"))}
        )
    okeys_sorted = np.sort(ot["o_orderkey"].to_numpy())
    odate = dict(
        zip(
            ot["o_orderkey"].to_numpy().tolist(),
            ot["o_orderdate"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    ok_ref = ray.put(okeys_sorted)

    li = _pq(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev_part(t: pa.Table, okr=ok_ref) -> pa.Table:
        keys = ray.get(okr) if isinstance(okr, ray.ObjectRef) else okr
        lo = t["l_orderkey"].to_numpy()
        ship = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
        )
        if keys.shape[0] == 0:
            hit = np.zeros(lo.shape[0], bool)
        else:
            pos = np.searchsorted(keys, lo)
            hit = (pos < keys.shape[0]) & (
                keys[np.minimum(pos, keys.shape[0] - 1)] == lo
            )
        m = hit & (ship >= cutoff)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        key = lo[m]
        term = np.round(price * 10000.0).astype(np.int64) * (
            100 - np.round(disc * 100.0).astype(np.int64)
        )
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(uk.shape[0], np.int64)
        np.add.at(s, inv, term)
        return pa.table(
            {"l_orderkey": pa.array(uk), "rev": pa.array(s)}
        )

    parts = _gather_partials(
        li.map_batches(rev_part, batch_format="pyarrow", zero_copy_batch=True),
        ("l_orderkey", "rev"),
    )
    if parts is None or len(parts) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "revenue_micro": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                }
            )
        )
    g = pa.TableGroupBy(parts, "l_orderkey").aggregate([("rev", "sum")])
    okey = g["l_orderkey"].to_numpy()
    rev = g["rev_sum"].to_numpy().astype(np.int64)
    order = np.lexsort((okey, -rev))[:k]
    micro = rev[order]
    sel = okey[order]
    return rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array(sel),
                "revenue_micro": pa.array(micro),
                "revenue": pa.array(micro / 1000000.0),
                "o_orderdate": pa.array(
                    np.array([odate[int(o)] for o in sel], "datetime64[us]")
                ),
            }
        )
    )


QUERIES["q3_shipping_priority"] = q3_shipping_priority

ORACLE_SQL["q3_shipping_priority"] = """
    WITH rev AS (
      SELECT l.l_orderkey AS o_orderkey,
             CAST(sum(CAST(round(l.l_extendedprice * 10000) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS revenue_micro,
             any_value(o.o_orderdate) AS o_orderdate
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < DATE '1998-01-01'
        AND l.l_shipdate >= DATE '1998-01-01'
      GROUP BY l.l_orderkey
    )
    SELECT o_orderkey, revenue_micro, revenue_micro / 1000000.0 AS revenue,
           o_orderdate
    FROM rev
    ORDER BY revenue_micro DESC, o_orderkey
    LIMIT 10
"""


_RFM_REF = np.datetime64("2002-01-01")


def _rfm_partial(t: pa.Table) -> pa.Table:
    """Block-local per-customer (max orderdate, count, cent sum)."""
    ck = t["o_custkey"].to_numpy()
    od = (
        t["o_orderdate"].to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").view(np.int64)
    )
    cents = np.round(
        t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
    ).astype(np.int64)
    uk, inv = np.unique(ck, return_inverse=True)
    mx = np.zeros(uk.shape[0], np.int64)
    np.maximum.at(mx, inv, od)
    cnt = np.bincount(inv).astype(np.int64)
    s = np.zeros(uk.shape[0], np.int64)
    np.add.at(s, inv, cents)
    return pa.table(
        {
            "c": pa.array(uk),
            "last_us": pa.array(mx),
            "freq": pa.array(cnt),
            "cents": pa.array(s),
        }
    )


def _rfm_merge(t: pa.Table) -> pa.Table:
    """Complete per-customer metrics for this shard's customers."""
    if len(t) == 0:
        return pa.table(
            {
                "c": pa.array([], pa.int64()),
                "recency_days": pa.array([], pa.int64()),
                "frequency": pa.array([], pa.int64()),
                "monetary_dollars": pa.array([], pa.int64()),
            }
        )
    g = pa.TableGroupBy(t, "c").aggregate(
        [("last_us", "max"), ("freq", "sum"), ("cents", "sum")]
    )
    last = g["last_us_max"].to_numpy().astype(np.int64)
    ref_us = _RFM_REF.astype("datetime64[us]").view(np.int64)
    rec = (ref_us - last) // np.int64(86_400_000_000)
    return pa.table(
        {
            "c": g["c"],
            "recency_days": pa.array(rec),
            "frequency": g["freq_sum"],
            "monetary_dollars": pa.array(
                g["cents_sum"].to_numpy().astype(np.int64) // 100
            ),
        }
    )


@ray.remote
def _rfm_vc(t: pa.Table, col: str) -> pa.Table:
    vc = pc.value_counts(t[col])
    return pa.table(
        {
            "v": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


@ray.remote
def _rfm_score(t: pa.Table, cdfs, n_total: int) -> pa.Table:
    """Attach rank-CDF quintiles: score = 1 + floor(5 * n_strictly_less
    / n) — RANK semantics (ties share a score), SQL-replayable."""
    out = {"c_custkey": t["c"]}
    names = {"recency_days": "r_score", "frequency": "f_score",
             "monetary_dollars": "m_score"}
    scores = {}
    for col, sc in names.items():
        vals, cum = cdfs[col]
        v = t[col].to_numpy()
        pos = np.searchsorted(vals, v)  # count of distinct values < v
        n_less = np.where(pos > 0, cum[np.maximum(pos - 1, 0)], 0)
        scores[sc] = (1 + (5 * n_less) // n_total).astype(np.int64)
        out[col] = t[col]
    for sc in ("r_score", "f_score", "m_score"):
        out[sc] = pa.array(scores[sc])
    out["rfm"] = pa.array(
        100 * scores["r_score"] + 10 * scores["f_score"] + scores["m_score"]
    )
    return pa.table(out)


def orders_rfm_scores(sf_dir: str):
    """RFM customer scoring (recency / frequency / monetary — the
    classic CRM segmentation): per-customer order aggregates on a
    custkey-keyed hash exchange, then rank-CDF quintile scores
    ``1 + floor(5 * n_strictly_less / n)`` (RANK semantics: ties share
    a score — NTILE's positional split is parallelism-hostile; this
    rule is a pure function of the value histogram). The three metric
    histograms are bounded (days / order counts / whole dollars),
    merge driver-side and broadcast once; scoring is a searchsorted
    per shard. Fully SQL-oracled via RANK() - 1."""
    from nlshray.stages.exchange import hash_exchange, int64_key_hash

    orders = _pq(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )
    refs = orders.select_columns(
        ["o_custkey", "o_orderdate", "o_totalprice"]
    ).to_arrow_refs()
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "recency_days": pa.array([], pa.int64()),
            "frequency": pa.array([], pa.int64()),
            "monetary_dollars": pa.array([], pa.int64()),
            "r_score": pa.array([], pa.int64()),
            "f_score": pa.array([], pa.int64()),
            "m_score": pa.array([], pa.int64()),
            "rfm": pa.array([], pa.int64()),
        }
    )
    if not refs:
        return rd.from_arrow(empty)
    shards = hash_exchange(
        refs, _rfm_partial, int64_key_hash("c"), _rfm_merge, NPARTS
    )
    cdfs = {}
    n_total = 0
    for col in ("recency_days", "frequency", "monetary_dollars"):
        vc = pa.concat_tables(ray.get([_rfm_vc.remote(r, col) for r in shards]))
        g = pa.TableGroupBy(vc, "v").aggregate([("n", "sum")])
        vals = g["v"].to_numpy()
        cnts = g["n_sum"].to_numpy().astype(np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cdfs[col] = (vals, np.cumsum(cnts))
        n_total = int(cnts.sum())
    if n_total == 0:
        return rd.from_arrow(empty)
    cdf_ref = ray.put(cdfs)
    out = [_rfm_score.remote(r, cdf_ref, n_total) for r in shards]
    return rd.from_arrow_refs(out)


QUERIES["orders_rfm_scores"] = orders_rfm_scores

ORACLE_SQL["orders_rfm_scores"] = """
    WITH m AS (
      SELECT o_custkey AS c_custkey,
             date_diff('day', max(o_orderdate), DATE '2002-01-01')
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100
               AS BIGINT) AS monetary_dollars
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT *,
             RANK() OVER (ORDER BY recency_days) - 1 AS lr,
             RANK() OVER (ORDER BY frequency) - 1 AS lf,
             RANK() OVER (ORDER BY monetary_dollars) - 1 AS lm,
             COUNT(*) OVER () AS n
      FROM m
    )
    SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary_dollars,
           CAST(1 + (5 * lr) // n AS BIGINT) AS r_score,
           CAST(1 + (5 * lf) // n AS BIGINT) AS f_score,
           CAST(1 + (5 * lm) // n AS BIGINT) AS m_score,
           CAST(100 * (1 + (5 * lr) // n) + 10 * (1 + (5 * lf) // n)
                + (1 + (5 * lm) // n) AS BIGINT) AS rfm
    FROM r
"""


def tiered_dedup_report(sf_dir: str):
    """TIERED DEDUP — the canonical web-corpus dedup cascade as ONE
    pipeline with per-tier accounting: T1 exact (byte-identical text)
    -> T2 normalized exact (casefold + whitespace collapse, the
    ``normalized_dup_docs`` kernel) -> T3 MinHash/LSH near-dup at
    J >= 0.8 (the flagship plan, keep component reps). Each tier runs
    only on the previous tier's survivors, so the report reads as the
    marginal catch of each (cheap -> expensive) tier — the ordering
    argument every production dedup stack is built on. All three tiers
    are the engine's production stages; the DuckDB oracle replays the
    WHOLE cascade in one query (windowed exact collapses + the full
    kernel-replay near-dup chain + recursive min-label components over
    the tier-2 survivors)."""
    from nlshray.stages.exact import exact_stage

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    n0 = docs.count()

    # T1: exact
    e1 = exact_stage(docs, num_partitions=NPARTS)

    def keep_rep_t1(t: pa.Table) -> pa.Table:
        m = pc.equal(t["doc_id"], t["rep_id"])
        return t.filter(m).select(["doc_id", "text"])

    s1 = e1.map_batches(
        keep_rep_t1, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n1 = s1.count()

    # T2: normalized exact over T1 survivors (original text carried)
    def norm(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        x = pc.utf8_lower(arr)
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim(x, " ")
        return pa.table(
            {"doc_id": t["doc_id"], "text": x, "orig": t["text"]}
        )

    e2 = exact_stage(
        s1.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        num_partitions=NPARTS,
    )

    def keep_rep_t2(t: pa.Table) -> pa.Table:
        m = pc.equal(t["doc_id"], t["rep_id"])
        t = t.filter(m)
        return pa.table({"doc_id": t["doc_id"], "text": t["orig"]})

    s2 = e2.map_batches(
        keep_rep_t2, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n2 = s2.count()

    # T3: flagship near-dup over T2 survivors
    res = dedup_docs(s2, CFG, num_partitions=NPARTS)
    clus = to_arrow(res.clusters)
    n3 = int(
        pc.sum(
            pc.cast(pc.equal(clus["doc_id"], clus["cluster_id"]), pa.int64())
        ).as_py()
        or 0
    )
    tiers = ["exact", "normalized", "near_dup"]
    n_in = [n0, n1, n2]
    n_out = [n1, n2, n3]
    return rd.from_arrow(
        pa.table(
            {
                "tier": pa.array(tiers, pa.string()),
                "n_in": pa.array(n_in, pa.int64()),
                "n_removed": pa.array(
                    [a - b for a, b in zip(n_in, n_out)], pa.int64()
                ),
                "n_out": pa.array(n_out, pa.int64()),
            }
        )
    )


QUERIES["tiered_dedup_report"] = tiered_dedup_report


def _build_tiered_oracle() -> str:
    chain = _near_dup_chain_sql("s2").strip()
    return rf"""
        WITH RECURSIVE
        tierx1 AS (
          SELECT doc_id, text,
                 MIN(doc_id) OVER (PARTITION BY text) AS rep1
          FROM documents
        ),
        s1 AS (SELECT doc_id, text FROM tierx1 WHERE doc_id = rep1),
        tierx2 AS (
          SELECT doc_id, text,
                 MIN(doc_id) OVER (PARTITION BY
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                 ) AS rep2
          FROM s1
        ),
        s2 AS (SELECT doc_id, text FROM tierx2 WHERE doc_id = rep2),
        {chain},
        alledge AS (
          SELECT left_id AS u, right_id AS v FROM conf
          UNION ALL
          SELECT doc_id AS u, rep_id AS v FROM rep WHERE doc_id <> rep_id
        ),
        sym AS MATERIALIZED (
          SELECT u, v FROM alledge UNION SELECT v AS u, u AS v FROM alledge
        ),
        reach(doc_id, r) AS (
          SELECT doc_id, doc_id FROM s2
          UNION
          SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.doc_id
        ),
        clus AS (
          SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
        ),
        c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
        c2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
        c3 AS (
          SELECT CAST(count(*) AS BIGINT) AS n
          FROM clus WHERE doc_id = cluster_id
        )
        SELECT v.tier, v.n_in, v.n_in - v.n_out AS n_removed, v.n_out
        FROM (
          SELECT 'exact' AS tier, c0.n AS n_in, c1.n AS n_out FROM c0, c1
          UNION ALL
          SELECT 'normalized', c1.n, c2.n FROM c1, c2
          UNION ALL
          SELECT 'near_dup', c2.n, c3.n FROM c2, c3
        ) v
    """


ORACLE_SQL["tiered_dedup_report"] = _build_tiered_oracle()


@ray.remote
def _late_block_meta(t: pa.Table) -> tuple[int, int, int]:
    """(block min event_id, block max ts_us, n rows) — blocks arrive
    range-partitioned from the sort, so min event_id orders them."""
    if len(t) == 0:
        return (1 << 62, -(1 << 62), 0)
    us = t["ts"].cast(pa.int64()).to_numpy()
    eid = t["event_id"].to_numpy()
    return (int(eid.min()), int(us.max()), len(t))


@ray.remote
def _late_block_windows(
    t: pa.Table, prefix_max_us: int, delay_us: int, window_us: int
) -> pa.Table:
    """Per-window (n_events, n_late) partial for one sorted block.
    Watermark at event i = max ts seen over all earlier ARRIVALS
    (event_id order) minus the allowed delay; the event is late if its
    window had already closed (window_end <= watermark)."""
    empty = pa.table(
        {
            "window_start_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    us = t["ts"].cast(pa.int64()).to_numpy()
    eid = t["event_id"].to_numpy()
    order = np.argsort(eid)
    us = us[order]
    # max ts STRICTLY BEFORE each row: cross-block prefix then shift
    cm = np.maximum.accumulate(us)
    prev = np.empty_like(cm)
    prev[0] = prefix_max_us
    prev[1:] = np.maximum(cm[:-1], prefix_max_us)
    win = us - us % window_us
    late = ((win + window_us) <= (prev - delay_us)).astype(np.int64)
    uw, inv = np.unique(win, return_inverse=True)
    n = np.bincount(inv).astype(np.int64)
    nl = np.zeros(uw.shape[0], np.int64)
    np.add.at(nl, inv, late)
    return pa.table(
        {
            "window_start_us": pa.array(uw),
            "n_events": pa.array(n),
            "n_late": pa.array(nl),
        }
    )


def events_late_arrivals(
    sf_dir: str, delay_seconds: int = 600, window_seconds: int = 3600
):
    """Watermark / late-data accounting — the streaming semantic every
    windowed pipeline needs at ingestion: replaying the event stream in
    ARRIVAL order (event_id — the ingestion sequence number), the
    watermark is ``max(ts seen so far) - allowed_delay``, and an event
    is LATE if its tumbling window had already closed when it arrived
    (``window_end <= watermark``). Reports per-window totals and late
    counts — exactly what an engine drops (or routes to a correction
    path) under each delay budget.

    Plan: one ``Dataset.sort`` on the arrival key (range-partitioned
    blocks), per-block running-max + a broadcast block-prefix max (the
    ``events_running_totals`` prefix device, applied globally), then
    bounded per-window partials merged on the driver. Integer
    microsecond arithmetic end-to-end — bit-exact SQL window replay.

    Assumes ts >= epoch (us >= 0): the engine buckets with numpy
    floor-mod (``us - us % window_us``) while the DuckDB oracle uses
    trunc-mod ``%`` — identical for non-negative microseconds, which
    web-crawl event streams always are; pre-1970 timestamps would
    bucket one window apart between the two."""
    delay_us = int(delay_seconds) * 1_000_000
    window_us = int(window_seconds) * 1_000_000
    ev = _pq(sf_dir, "events", columns=["event_id", "ts"]).sort("event_id")
    refs = ev.to_arrow_refs()
    empty = pa.table(
        {
            "window_start_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
        }
    )
    if not refs:
        return rd.from_arrow(empty)
    metas = ray.get([_late_block_meta.remote(r) for r in refs])
    order = np.argsort([m[0] for m in metas], kind="stable")
    prefix = -(1 << 62)
    out = []
    for bi in order:
        if metas[bi][2] == 0:
            continue
        out.append(
            _late_block_windows.remote(refs[bi], prefix, delay_us, window_us)
        )
        prefix = max(prefix, metas[bi][1])
    if not out:
        return rd.from_arrow(empty)
    parts = pa.concat_tables(ray.get(out))
    g = pa.TableGroupBy(parts, "window_start_us").aggregate(
        [("n_events", "sum"), ("n_late", "sum")]
    )
    return rd.from_arrow(
        g.rename_columns(["window_start_us", "n_events", "n_late"])
    )


QUERIES["events_late_arrivals"] = events_late_arrivals

ORACLE_SQL["events_late_arrivals"] = """
    WITH w AS (
      SELECT CAST(EPOCH_US(ts) AS BIGINT) AS us,
             MAX(CAST(EPOCH_US(ts) AS BIGINT)) OVER (
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max
      FROM events
    ),
    f AS (
      SELECT us - us % 3600000000 AS window_start_us,
             CASE WHEN prev_max IS NOT NULL
                   AND (us - us % 3600000000) + 3600000000
                       <= prev_max - 600000000
                  THEN 1 ELSE 0 END AS late
      FROM w
    )
    SELECT window_start_us, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(late) AS BIGINT) AS n_late
    FROM f GROUP BY window_start_us
"""


# ---------------------------------------------------------------------------
# registry ordering (r4 verdict "next round" #1)
# ---------------------------------------------------------------------------
# The correctness driver verifies a PREFIX of this registry (50 slots in
# round 4; rounds ran 22/31/36/50 entries). Rounds 1-4 always listed the
# same first 50 names, so the 78 operators registered later (the whole
# round-3/4 wave: Gopher, DSIR, LM perplexity, BPE, exchange-migrated
# ops, ...) never received a driver-side correctness row despite
# matching in every builder/judge sweep. Reorder so the driver window
# covers them: a small still-verified core (flagship near-dup chain +
# exact dedup) plus the fixed `corpus_diff` leads, followed by the 45
# highest-value never-driver-verified SQL-oracled queries; after the
# window come the remaining unverified oracled entries (in case the
# window grows again), then the rows-only heads, then the queries the
# driver already verified green in rounds 1-4.

_DRIVER_PREFIX = [
    # verified core kept in-window (flagship must stay green)
    "near_dup_pairs",
    "near_dup_clusters",
    "minhash_signatures",
    "exact_dup_docs",
    # driver-red in r4 (boundary serialization); hardened above
    "corpus_diff",
    # never-driver-verified, SQL-oracled, highest value first
    "gopher_quality_filter",
    "dsir_resampled",
    "lm_perplexity_scores",
    "ccnet_tiers",
    "nb_quality_scores",
    "bpe_word_counts",
    "tiered_dedup_report",
    "exact_substring_dedup",
    "heavy_hitter_tokens",
    "curated_corpus",
    "collocations_pmi",
    "events_late_arrivals",
    "normalized_dup_docs",
    "line_dedup_docs",
    "containment_pairs",
    "ssjoin_jaccard_pairs",
    "bm25_search",
    "token_entropy",
    "mixture_weights",
    "weighted_sample_docs",
    "weighted_sample_by_lang",
    "source_divergence_jsd",
    "knn_graph",
    "embedding_covariance",
    "dup_cluster_sizes",
    "source_dup_rates",
    "band_stats",
    "dataset_splits",
    "chunked_docs",
    "duplicate_spans",
    "vocab_top_tokens",
    "distinct_tokens_hll",
    "tfidf_dup_pairs",
    "doc_keywords_tfidf",
    "blocklist_filter",
    "lang_mismatches",
    "quality_filtered_docs",
    "cluster_exemplars",
    "capped_docs_per_source",
    "epoch_shuffled_order",
    "latest_event_per_user",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "orders_rfm_scores",
    "lm_perplexity_by_lang",
]

_SECOND_WINDOW = [
    # remaining never-driver-verified oracled queries (slots 51+)
    "embedding_dup_pairs",
    "embedding_novelty_incremental",
    "user_retention_cohorts",
    "events_anomaly",
    "events_markov_transitions",
    "source_token_entropy",
    "part_pair_support",
    "snapshot_drift_ks",
    "lang_source_mi",
    "event_funnel",
    "events_profile",
    "events_hourly_users",
    "lineitem_correlations",
    "source_similarity",
    "distinct_tokens_by_lang_hll",
    "token_bigram_rarity",
    "token_frequency_spectrum",
    "length_pct_rank_by_lang",
    "length_mad_by_lang",
    "modal_length_by_lang",
    "events_props_typed",
    # rows-only heads (no oracle; driver records rows>=0)
    "knn_cosine_lsh",
    "knn_hnsw",
    "knn_ivf",
    "knn_pq",
    "knn_neural",
    "knn_neural_trained",
    "semantic_dup_pairs",
    "quantiles_sketch_by_lang",
    "embedding_pca",
    "compression_ratios",
    "bpe_vocab",
    "bpe_token_counts",
    "cdc_chunk_dedup",
    "embedding_kmeans",
]


def _reorder_registry() -> None:
    global QUERIES
    head = _DRIVER_PREFIX + _SECOND_WINDOW
    missing = [n for n in head if n not in QUERIES]
    assert not missing, f"registry reorder references unknown queries: {missing}"
    assert len(set(head)) == len(head), "registry reorder has duplicates"
    tail = [n for n in QUERIES if n not in set(head)]
    QUERIES = {n: QUERIES[n] for n in head + tail}


_reorder_registry()
