"""Driver-contract registry invariants."""

import numpy as np

import __ray_entry__ as entry_mod


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oss = entry_mod.oracle_sql()
    assert set(oss) <= set(qs), set(oss) - set(qs)
    assert len(qs) >= 18
    assert len(oss) >= 12
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oss.values())


def test_smoke_one_query_runs(ray_session):
    out = entry_mod.queries()["token_counts"]("/root/testdata/sf0.001")
    import ray

    tbl = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(tbl) == 500


def test_sampled_docs_seeded_deterministic(ray_session):
    """T2: Dataset.random_sample(seed=) — same seed, same sample."""
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    a = to_arrow(QUERIES["sampled_docs"]("/root/testdata/sf0.001"))
    b = to_arrow(QUERIES["sampled_docs"]("/root/testdata/sf0.001"))
    assert a.num_rows > 0
    assert sorted(a["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())


def test_q5_region_volume_matches_pandas_oracle(ray_session):
    """Five-table join: broadcast dims + one big-big shuffle join must
    reproduce the relational semantics exactly (values then rounded)."""
    import pandas as pd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = to_arrow(QUERIES["q5_region_volume"](sf)).to_pandas()

    t = {n: pd.read_parquet(f"{sf}/{n}.parquet")
         for n in ["region", "nation", "customer", "supplier", "orders", "lineitem"]}
    rk = set(t["region"].loc[t["region"].r_name == "ASIA", "r_regionkey"])
    nat = t["nation"][t["nation"].n_regionkey.isin(rk)]
    df = (
        t["orders"]
        .loc[lambda d: (d.o_orderdate >= "1995-01-01") & (d.o_orderdate < "1996-01-01")]
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
        .merge(t["lineitem"], left_on="o_orderkey", right_on="l_orderkey")
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
        .loc[lambda d: d.c_nationkey == d.s_nationkey]
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    )
    df["rev"] = df.l_extendedprice * (1 - df.l_discount)
    want = df.groupby("n_name").rev.sum().round(2).sort_index()
    got = got.set_index("n_name").revenue.sort_index()
    assert len(got) > 0
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_inactive_customers_anti_join(ray_session):
    """Broadcast anti-join == pandas NOT-IN on the active key set."""
    import numpy as np
    import pandas as pd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = to_arrow(QUERIES["inactive_customers"](sf)).to_pandas()
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    active = set(orders.loc[orders.o_orderdate >= "2001-01-01", "o_custkey"])
    want = cust.loc[~cust.c_custkey.isin(active), ["c_custkey", "c_name"]]
    assert len(got) > 0
    assert sorted(got.c_custkey) == sorted(want.c_custkey)
    assert set(got.columns) == {"c_custkey", "c_name"}


def test_resampled_corpus_weights_and_determinism(ray_session):
    """Mix resampler: per-source copy counts follow the weight class and
    the emitted set is identical across runs (pure hash function)."""
    import numpy as np
    import pandas as pd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES, _mix_weight

    sf = "/root/testdata/sf0.001"
    a = to_arrow(QUERIES["resampled_corpus"](sf)).to_pandas()
    b = to_arrow(QUERIES["resampled_corpus"](sf)).to_pandas()
    key = ["doc_id", "copy"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )

    src_idx = a.source.str.removeprefix("src").astype(int) % 20
    w = src_idx.map(_mix_weight)
    copies = a.groupby("doc_id").copy.max() + 1
    wmax = a.assign(w=w).groupby("doc_id").w.first()
    # every emitted doc's copy count is floor(w) or floor(w)+1
    assert ((copies == np.floor(wmax)) | (copies == np.floor(wmax) + 1)).all()
    # weight-1.0 sources emit exactly one copy per doc, never more
    assert (copies[wmax == 1.0] == 1).all()
    # aggregate mix moves toward the weights: upsampled class beats downsampled
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    n_raw = len(docs)
    emitted = len(a)
    expect = docs.source.str.removeprefix("src").astype(int).mod(20).map(_mix_weight).sum()
    assert abs(emitted - expect) < 0.1 * n_raw


def test_quantized_embeddings_roundtrip(ray_session):
    """Int8 quantization reconstructs within half a quantization step."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as papq

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = to_arrow(QUERIES["quantized_embeddings"](sf)).to_pandas()
    src = papq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    d = len(src.embedding.iloc[0])
    assert len(got) == len(src) * d
    assert got.q.abs().max() <= 127

    one = src.iloc[0]
    rows = got[got.vec_id == one.vec_id].sort_values("pos")
    e = np.asarray(one.embedding, dtype=np.float64)
    scale = rows.scale.iloc[0]
    assert scale == np.abs(e).max()
    recon = rows.q.to_numpy() * scale / 127.0
    assert np.abs(recon - e).max() <= scale / 127.0 * 0.5 + 1e-12


def test_corpus_diff_statuses(ray_session):
    """Full-outer snapshot diff: statuses follow the derivation rules."""
    import pandas as pd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = to_arrow(QUERIES["corpus_diff"](sf)).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    ids = docs.doc_id

    removed = set(got.loc[got.status == "removed", "doc_id"])
    added = set(got.loc[got.status == "added", "doc_id"])
    changed = set(got.loc[got.status == "changed", "doc_id"])
    assert removed == set(ids[ids % 10 == 0])
    assert added == set(ids[ids % 13 == 0] + 1_000_000)
    # changed = uppercased survivors (% 7, not % 10) whose text actually changes
    assert changed <= set(ids[(ids % 7 == 0) & (ids % 10 != 0)])
    assert removed.isdisjoint(changed) and added.isdisjoint(changed)
    assert len(got) == len(removed) + len(added) + len(changed)


def test_knn_cosine_int8_recall_vs_exact(ray_session):
    """Quantized-cosine top-10 stays close to the float top-10."""
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = to_arrow(QUERIES["knn_cosine"](sf)).to_pandas()
    q8 = to_arrow(QUERIES["knn_cosine_int8"](sf)).to_pandas()
    assert len(q8) == len(exact) == 50
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        a = set(grp.neighbor_id)
        b = set(q8.loc[q8.query_id == qid, "neighbor_id"])
        recalls.append(len(a & b) / len(a))
    assert sum(recalls) / len(recalls) >= 0.8


def test_source_lang_rollup_levels_consistent(ray_session):
    """ROLLUP invariants: each level re-aggregates the one below it."""
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    got = to_arrow(QUERIES["source_lang_rollup"]("/root/testdata/sf0.001")).to_pandas()
    l0 = got[got.level == 0]
    l1 = got[got.level == 1].set_index("source")
    l2 = got[got.level == 2]
    assert len(l2) == 1 and l2.iloc[0].source == "*ALL*" and l2.iloc[0].lang == "*ALL*"
    assert l2.iloc[0].n_docs == l0.n_docs.sum() == l1.n_docs.sum()
    assert l2.iloc[0].sum_chars == l0.sum_chars.sum()
    per_src = l0.groupby("source")[["n_docs", "sum_chars"]].sum()
    for src, row in per_src.iterrows():
        assert l1.loc[src].n_docs == row.n_docs
        assert l1.loc[src].sum_chars == row.sum_chars


def test_events_pivot_counts(ray_session):
    """Pivot columns sum to the per-user event count."""
    import pandas as pd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import _EVENT_TYPES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = to_arrow(QUERIES["events_pivot"](sf)).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    assert len(got) == ev.user_id.nunique()
    wide = got.set_index("user_id")
    assert (wide[[f"n_{t}" for t in _EVENT_TYPES]].sum(axis=1) == wide.n_total).all()
    want = ev.groupby(["user_id", "event_type"]).size()
    for (uid, et), n in want.items():
        assert wide.loc[uid, f"n_{et}"] == n


def test_grouped_hll_consistent_with_global(ray_session):
    """Max-merging the per-lang sketches reproduces the global sketch
    (register max is associative), and each estimate is sane."""
    import numpy as np

    from nlshray.functions.hll import M, hll_estimate
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    per = to_arrow(QUERIES["distinct_tokens_by_lang_hll"](sf)).to_pandas()
    glob = to_arrow(QUERIES["distinct_tokens_hll"](sf)).to_pandas()

    merged = np.zeros(M, np.uint8)
    for _, row in per.iterrows():
        merged[row.register] = max(merged[row.register], row.rho)
    want = np.zeros(M, np.uint8)
    want[glob.register] = glob.rho
    assert np.array_equal(merged, want)

    import duckdb
    true_total = duckdb.sql(
        f"""SELECT count(DISTINCT u.tok) FROM (
              SELECT list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                 t -> t <> '') AS toks
              FROM read_parquet('{sf}/documents.parquet')), unnest(toks) AS u(tok)"""
    ).fetchone()[0]
    est = hll_estimate(want)
    assert abs(est - true_total) / true_total < 0.05


def test_dup_cluster_sizes_accounts_every_doc(ray_session):
    """Histogram mass equals the corpus: sum(size * n_clusters) = n_docs."""
    from nlshray.pipelines.queries import QUERIES

    got = QUERIES["dup_cluster_sizes"]("/root/testdata/sf0.001").to_pandas()
    assert (got["n_docs"] == got["cluster_size"] * got["n_clusters"]).all()
    assert int(got["n_docs"].sum()) == 500
    assert (got.loc[got["cluster_size"] == 1, "n_clusters"] > 0).all()


def test_normalized_dup_docs_semantics(ray_session):
    """Casefold + whitespace-collapse dedup: groups must match a pandas
    replay of the same normalization over the real fixture table."""
    import pandas as pd
    import re

    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = (
        QUERIES["normalized_dup_docs"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    norm = df["text"].map(lambda s: re.sub(r"\s+", " ", s.lower()).strip(" "))
    df = df.assign(ntext=norm)
    df["keep_id"] = df.groupby("ntext")["doc_id"].transform("min")
    df["n_copies"] = df.groupby("ntext")["doc_id"].transform("count")
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert got["keep_id"].tolist() == df["keep_id"].tolist()
    assert got["n_copies"].tolist() == df["n_copies"].tolist()
    # normalized groups must be a refinement-superset of exact groups:
    # every exact dup is also a normalized dup
    exact = (
        QUERIES["exact_dup_docs"](sf).to_pandas().sort_values("doc_id")
    )
    assert (got["n_copies"].values >= exact["n_copies"].values).all()


def test_compression_ratios_deterministic_and_sane(ray_session):
    import zlib

    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = (
        QUERIES["compression_ratios"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        QUERIES["compression_ratios"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) == 500
    assert ((a["compression_ratio"] > 0) & (a["compression_ratio"] < 2)).all()
    # spot-check one row against a direct zlib call
    import pandas as pd

    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    row = df.iloc[17]
    want = len(zlib.compress(row["text"].encode(), 6)) / len(
        row["text"].encode()
    )
    got = float(a.set_index("doc_id").loc[row["doc_id"], "compression_ratio"])
    assert abs(got - round(want, 6)) < 1e-9
    # repetitive text compresses harder than the natural-text corpus
    rep_ratio = len(zlib.compress(b"spam " * 200, 6)) / 1000
    assert rep_ratio < a["compression_ratio"].median()


def test_lang_source_mi_matches_numpy_replay(ray_session):
    import pandas as pd

    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["lang_source_mi"](sf).to_pandas().iloc[0]
    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "source"])
    n = len(df)

    def ent(p):
        return float(-(p * np.log(p)).sum())

    h_l = ent(df["lang"].value_counts().values / n)
    h_s = ent(df["source"].value_counts().values / n)
    h_j = ent(df.groupby(["lang", "source"]).size().values / n)
    assert abs(got["h_lang"] - h_l) < 1e-5
    assert abs(got["h_source"] - h_s) < 1e-5
    assert abs(got["h_joint"] - h_j) < 1e-5
    mi = got["mi"]
    # information-theoretic invariants (rounding gives 1e-6 slack)
    assert mi >= -1e-5
    assert mi <= min(h_l, h_s) + 1e-5
    assert got["n_rows"] == n


def test_modal_length_by_lang_matches_pandas(ray_session):
    import pandas as pd

    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = (
        QUERIES["modal_length_by_lang"](sf)
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "n_chars"])
    cnt = df.groupby(["lang", "n_chars"]).size().reset_index(name="n")
    # deterministic tie-break: max count, then smallest value
    cnt = cnt.sort_values(["lang", "n", "n_chars"], ascending=[True, False, True])
    want = cnt.groupby("lang").head(1).set_index("lang").sort_index()
    assert got["modal_n_chars"].tolist() == want["n_chars"].tolist()
    assert got["n_modal"].tolist() == want["n"].tolist()


def test_blocklist_filter_semantics(ray_session):
    """Word-boundary (not substring) match; leftmost hit attributed."""
    import re

    import pandas as pd

    from nlshray.pipelines.queries import _BLOCKLIST, QUERIES

    sf = "/root/testdata/sf0.001"
    got = (
        QUERIES["blocklist_filter"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    pat = re.compile(r"\b(" + "|".join(_BLOCKLIST) + r")\b")
    want = (
        df.assign(
            matched_term=df["text"].map(
                lambda s: (pat.search(s) or [None]) and (
                    pat.search(s).group(1) if pat.search(s) else ""
                )
            )
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["matched_term"].tolist() == want["matched_term"].tolist()
    assert got["blocked"].tolist() == (want["matched_term"] != "").tolist()
    # the filter must actually split the corpus (not vacuously all/none)
    assert 0 < int(got["blocked"].sum()) < len(got)


def test_snapshot_drift_ks_matches_scipy_free_replay(ray_session):
    import pandas as pd

    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["snapshot_drift_ks"](sf).to_pandas().iloc[0]
    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    a = np.sort(df.loc[df["doc_id"] % 2 == 0, "n_chars"].values)
    b = np.sort(df.loc[df["doc_id"] % 2 == 1, "n_chars"].values)
    support = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, support, side="right") / a.shape[0]
    cb = np.searchsorted(b, support, side="right") / b.shape[0]
    gap = np.abs(ca - cb)
    assert abs(got["ks_stat"] - gap.max()) < 1e-6
    assert got["at_n_chars"] == int(support[np.argmax(gap)])
    assert got["n_even"] == a.shape[0] and got["n_odd"] == b.shape[0]
    # KS invariant: statistic in [0, 1]
    assert 0.0 <= got["ks_stat"] <= 1.0


def test_corpus_diff_driver_boundary_roundtrip(ray_session):
    """r4 verdict #2: the one red CORRECTNESS row was a serialization
    artifact at the driver/engine boundary (full-outer join block
    schemas reaching the driver's comparator). Replays the driver's
    exact path — Dataset.to_pandas -> sorted-column canon -> pandas
    value hash — against the DuckDB oracle and requires a bit-exact
    hash match plus a frozen (doc_id:int64, status:string) schema."""
    import hashlib

    import duckdb
    import pandas as pd
    import pyarrow as pa

    from nlshray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    ds = QUERIES["corpus_diff"](sf)

    # frozen narrow schema: nothing wider than (doc_id, status) may
    # reach the driver, and no large_string / chunked surprises
    tbl = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert tbl.schema == pa.schema(
        [("doc_id", pa.int64()), ("status", pa.string())]
    )

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def vhash(df):
        return hashlib.sha256(
            pd.util.hash_pandas_object(df, index=False).values.tobytes()
        ).hexdigest()

    mine = canon(ds.to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    oracle = canon(con.sql(ORACLE_SQL["corpus_diff"]).df())
    assert len(mine) == len(oracle) > 0
    assert list(mine.columns) == list(oracle.columns)
    assert vhash(mine) == vhash(oracle)
