"""Cross-corpus near-dup join: decontaminate a corpus against a probe set.

The eval-set-decontamination shape every LLM curation pipeline runs:
given a big corpus and a SMALL probe table (eval/benchmark documents),
find every (corpus_doc, probe_doc) pair that is an exact duplicate or a
near-duplicate at the flagship MinHash/LSH threshold. Semantically this
equals running the flagship chain over the UNION of the two sides and
keeping only cross-side pairs (which is exactly what the SQL oracle
replays); the plan, however, never generates a corpus-corpus candidate:

1. ``exact_stage`` over the union (side flag carried) — exact cross
   dups fall out as probe-touched text groups, jaccard 1.0.
2. Sign + band the group reps (the corpus must be signed no matter
   what — that cost is irreducible), then broadcast the PROBE side's
   band keys (``|probes| * bands`` int64s) and membership-filter the
   corpus band rows against them: only rows landing in a probe bucket
   survive, so candidate generation touches ``O(|probes| * bands)``
   rows instead of the corpus's full band table, and no corpus
   self-pair is ever emitted.
3. Exact shingle-set Jaccard verify of the surviving candidates
   (``verify.gather_shingle_sets`` + ``flat_pair_jaccard`` — the
   flagship's own kernels), threshold ``cfg.threshold``.
4. Expand confirmed REP pairs through the exact-dup membership map to
   (corpus_id, probe_id) rows — cross-side only, both directions.

Driver-side state is bounded by the probe side and its collisions
(probe rows, probe-bucket band rows, confirmed-pair members), never by
the corpus — the contract is |probes| << |corpus| (eval sets are
thousands of docs). The corpus itself only streams: once through
exact, once through sign, once per gather probe.

Output: (corpus_id, probe_id, jaccard) sorted — jaccard 1.0 for exact
text matches, else the verified shingle-set Jaccard of the two docs'
exact-dup reps. Bit-replayable: the SQL oracle runs the union chain
and filters cross-side (``_build_cross_near_dups_oracle``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.config import DedupConfig
from nlshray.functions.nputil import isin_sorted
from nlshray.stages.band import band_stage
from nlshray.stages.exact import exact_stage
from nlshray.stages.sign import sign_stage
from nlshray.stages.verify import flat_pair_jaccard, gather_shingle_sets


def _gather(ds: ray.data.Dataset, cols: list[str], mask_fn) -> pa.Table:
    """Stream ``ds`` through a vectorized row mask, collect the (small)
    survivors driver-side."""

    def fn(t: pa.Table) -> pa.Table:
        return t.select(cols).filter(pa.array(mask_fn(t)))

    out = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    tables = [b for b in out.iter_batches(batch_format="pyarrow")]
    if not tables:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    return pa.concat_tables(tables)


def _rep_slice(rep_sorted: np.ndarray, doc_sorted: np.ndarray, rep_id: int) -> np.ndarray:
    lo = np.searchsorted(rep_sorted, rep_id, side="left")
    hi = np.searchsorted(rep_sorted, rep_id, side="right")
    return doc_sorted[lo:hi]


def cross_near_dups(
    docs: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    *,
    probe_col: str = "is_probe",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(doc_id, text, is_probe) -> (corpus_id, probe_id, jaccard)."""
    cfg = cfg or DedupConfig()
    docs_rep = exact_stage(
        docs, num_partitions=num_partitions
    ).materialize()  # reused by four consumers below; persist at 100 TB

    # probe side (small by contract) + the text groups it touches
    probes = _gather(
        docs_rep,
        ["doc_id", "rep_id"],
        lambda t: t[probe_col].to_numpy(zero_copy_only=False),
    )
    probe_doc = probes["doc_id"].to_numpy()
    probe_rep = probes["rep_id"].to_numpy()
    touched = np.unique(probe_rep)

    # exact cross pairs: corpus members of probe-touched groups
    corpus_in_touched = _gather(
        docs_rep,
        ["doc_id", "rep_id"],
        lambda t: (~t[probe_col].to_numpy(zero_copy_only=False))
        & isin_sorted(touched, t["rep_id"].to_numpy()),
    )
    p_rep_sorted = np.sort(probe_rep, kind="stable")
    p_doc_by_rep = probe_doc[np.argsort(probe_rep, kind="stable")]
    exact_c, exact_p = [], []
    c_rep = corpus_in_touched["rep_id"].to_numpy()
    c_doc = corpus_in_touched["doc_id"].to_numpy()
    for i in range(len(c_doc)):
        ps = _rep_slice(p_rep_sorted, p_doc_by_rep, c_rep[i])
        exact_c.append(np.full(ps.shape[0], c_doc[i], dtype=np.int64))
        exact_p.append(ps)
    exact_c = np.concatenate(exact_c) if exact_c else np.empty(0, np.int64)
    exact_p = np.concatenate(exact_p) if exact_p else np.empty(0, np.int64)

    # sign + band the union reps; broadcast probe band keys as the filter
    reps_ds = docs_rep.map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy() == t["rep_id"].to_numpy())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bands = band_stage(sign_stage(reps_ds, cfg), cfg).materialize()
    probe_band = _gather(
        bands,
        ["band_hash", "doc_id"],
        lambda t: isin_sorted(touched, t["doc_id"].to_numpy()),
    )
    probe_keys = np.unique(probe_band["band_hash"].to_numpy())
    keys_ref = ray.put(probe_keys)

    def hit(t: pa.Table) -> np.ndarray:
        return isin_sorted(ray.get(keys_ref), t["band_hash"].to_numpy())

    hits = _gather(bands, ["band_hash", "doc_id"], hit)

    # candidate rep pairs: within each probe bucket, touched x everyone
    bh = hits["band_hash"].to_numpy()
    hid = hits["doc_id"].to_numpy()
    order = np.argsort(bh, kind="stable")
    bh, hid = bh[order], hid[order]
    starts = np.flatnonzero(np.r_[True, bh[1:] != bh[:-1]])
    ends = np.r_[starts[1:], bh.shape[0]]
    cand_l, cand_r = [], []
    for s, e in zip(starts, ends):
        mem = hid[s:e]
        inp = isin_sorted(touched, mem)
        if not inp.any() or e - s < 2:
            continue
        a = np.repeat(mem[inp], e - s)
        b = np.tile(mem, int(inp.sum()))
        keep = a != b
        a, b = a[keep], b[keep]
        cand_l.append(np.minimum(a, b))
        cand_r.append(np.maximum(a, b))
    if cand_l:
        lr = np.unique(
            np.stack([np.concatenate(cand_l), np.concatenate(cand_r)], axis=1),
            axis=0,
        )
        L, R = lr[:, 0], lr[:, 1]
    else:
        L = R = np.empty(0, np.int64)

    # exact shingle-set verify at the flagship threshold
    conf_l = conf_r = np.empty(0, np.int64)
    conf_j = np.empty(0, np.float64)
    if L.shape[0]:
        fs = gather_shingle_sets(reps_ds, np.unique(np.r_[L, R]), cfg)
        jac = flat_pair_jaccard(fs, L, R)
        keep = jac >= cfg.threshold
        conf_l, conf_r, conf_j = L[keep], R[keep], jac[keep]

    # expand confirmed REP pairs through exact-dup membership, cross only
    out_c = [exact_c]
    out_p = [exact_p]
    out_j = [np.ones(exact_c.shape[0], dtype=np.float64)]
    if conf_l.shape[0]:
        involved = np.unique(np.r_[conf_l, conf_r])
        members = _gather(
            docs_rep,
            ["doc_id", "rep_id", probe_col],
            lambda t: isin_sorted(involved, t["rep_id"].to_numpy()),
        )
        m_rep = members["rep_id"].to_numpy()
        m_doc = members["doc_id"].to_numpy()
        m_probe = members[probe_col].to_numpy(zero_copy_only=False)
        mo = np.argsort(m_rep, kind="stable")
        cr, cd = m_rep[mo][~m_probe[mo]], m_doc[mo][~m_probe[mo]]
        pr, pd = m_rep[mo][m_probe[mo]], m_doc[mo][m_probe[mo]]
        for a, b, j in zip(conf_l, conf_r, conf_j):
            for ra, rb in ((a, b), (b, a)):
                cm = _rep_slice(cr, cd, ra)
                pm = _rep_slice(pr, pd, rb)
                if cm.shape[0] and pm.shape[0]:
                    out_c.append(np.repeat(cm, pm.shape[0]))
                    out_p.append(np.tile(pm, cm.shape[0]))
                    out_j.append(np.full(cm.shape[0] * pm.shape[0], j))

    corpus_id = np.concatenate(out_c)
    probe_id = np.concatenate(out_p)
    jaccard = np.concatenate(out_j)
    order = np.lexsort((probe_id, corpus_id))
    return ray.data.from_arrow(
        pa.table(
            {
                "corpus_id": pa.array(corpus_id[order], pa.int64()),
                "probe_id": pa.array(probe_id[order], pa.int64()),
                "jaccard": pa.array(np.round(jaccard[order], 6), pa.float64()),
            }
        )
    )
