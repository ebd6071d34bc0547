"""Cross-engine DuckDB oracles for the iteratively-TRAINED ANN queries.

Round-2's goldens pinned WHICH rows the engine selected and let DuckDB
recompute only the values — the selection half of those green rows was
self-referential. This module removes that circularity: the TRAINED
artifacts (IVF centroids, PQ codebooks, IVF-PQ coarse+fine codebooks,
the OPQ rotation) are frozen into parquet by ``tools/make_ann_goldens.py``
and the oracles below recompute the FULL search — coarse assignment,
bucket probing, PQ encoding, ADC distance tables, shortlist, exact
re-rank — in DuckDB from those artifacts. The engine's selection is now
decided cross-engine; the artifacts themselves are regression-guarded by
``tests/test_ann_artifacts.py`` (inline retraining must reproduce them).

The artifacts are per-SF (training is data-dependent). One oracle string
must serve whichever SF dir the driver mounts, so each artifact CTE is a
UNION of the per-SF parquet files, each branch gated on an exact-integer
corpus fingerprint ``count(*) * 1000000 + sum(label)`` — distinct per
generated tag (recorded in meta.json; corpus COUNT alone does not
disambiguate: sf0.001 and sf0.01 both carry 500 embeddings).

MMR needs no trained artifact at all: greedy selection is sequential but
FIXED-LENGTH (10 picks), so its oracle fully unrolls the greedy loop as
ten chained CTEs — selection and scores are cross-engine at any SF.

Only public interfaces appear here: DuckDB SQL (list lambdas,
read_parquet) and the Spark-side arithmetic contracts these mirror
(6dp-rounded distances, id tie-breaks) documented in similarity.py.
"""

from __future__ import annotations

import json
import pathlib

_ART_DIR = pathlib.Path(__file__).resolve().parent / "ann_artifacts"

# Spark: aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, acc+d), then
# round 6 — elementwise sequential sum; list_sum(list_transform(...)) is
# the DuckDB twin (same term order).
_D2 = (
    "round(list_sum(list_transform(generate_series(1, {n}),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 6)"
)
_COS = (
    "list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a}))"
    " * sqrt(list_inner_product({b}, {b})))"
)
# unit-normalization twin of similarity._unit_vectors
_NV = (
    "SELECT vec_id,"
    " list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS e FROM v"
)

_PQ_M = 8
_PQ_SUB = 8
_SHORTLIST = 50
_NPROBE = 3
_DIMS = 64

_SUBSPACES = f"(SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m)"


def _meta() -> dict[str, int] | None:
    p = _ART_DIR / "meta.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


_FINGERPRINT = "(SELECT count(*) * 1000000 + sum(label) FROM embeddings)"


def _artifact_cte(meta: dict[str, int], name: str) -> str:
    """UNION of per-SF artifact files, each branch live only when the
    mounted embeddings table carries that SF's corpus fingerprint."""
    branches = [
        f"SELECT * FROM read_parquet('{_ART_DIR}/{tag}/{name}.parquet')"
        f" WHERE {_FINGERPRINT} = {fp}"
        for tag, fp in sorted(meta.items())
    ]
    return "\n      UNION ALL ".join(branches)


def _topk_tail(exact_cte: str = "exact") -> str:
    return f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM {exact_cte})
    WHERE rn <= 10
    ORDER BY query_id, cosine DESC, vec_id
    """


def ivf_kmeans_oracle() -> str | None:
    meta = _meta()
    if not meta:
        return None
    d2_vc = _D2.format(a="v.e", b="cent.c", n=_DIMS)
    cos_qc = _COS.format(a="q.qe", b="cent.c")
    cos_qe = _COS.format(a="p.qe", b="a.e")
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (
      {_artifact_cte(meta, "ivf_centroids")}
    ),
    assigned AS (
      SELECT vec_id, e, cid FROM (
        SELECT v.vec_id, v.e, cent.cid,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2_vc}, cent.cid) AS rn
        FROM v CROSS JOIN cent)
      WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM assigned WHERE vec_id < 5),
    probe AS (
      SELECT query_id, cid, qe FROM (
        SELECT q.query_id, cent.cid, q.qe,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY round({cos_qc}, 6) DESC, cent.cid)
                 AS brank
        FROM q CROSS JOIN cent)
      WHERE brank <= 3
    ),
    exact AS (
      SELECT p.query_id, a.vec_id, round({cos_qe}, 6) AS cosine
      FROM probe p JOIN assigned a
        ON a.cid = p.cid AND a.vec_id <> p.query_id
    )
    {_topk_tail()}
    """


def _pq_search_sql(space_sql: str, cb_name: str, meta: dict[str, int]) -> str:
    """Shared PQ ADC search: encode `space` (vec_id, e in coding space)
    against the frozen codebooks, per-query distance tables, ADC sum,
    50-deep shortlist, exact cosine re-rank over RAW embeddings."""
    d2_sc = _D2.format(a="s.sub", b="cb.c", n=_PQ_SUB)
    d2_qc = _D2.format(a="q.sub", b="cb.c", n=_PQ_SUB)
    cos_qe = _COS.format(a="q.qe", b="v.e")
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    nv AS ({_NV}),
    cb AS (
      {_artifact_cte(meta, cb_name)}
    ),
    space AS ({space_sql}),
    subs AS (
      SELECT vec_id, mm.m,
             list_slice(e, mm.m * {_PQ_SUB} + 1, mm.m * {_PQ_SUB} + {_PQ_SUB}) AS sub
      FROM space CROSS JOIN {_SUBSPACES} mm
    ),
    codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, cb.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {d2_sc}, cb.cid) AS rn
        FROM subs s JOIN cb ON cb.m = s.m)
      WHERE rn = 1
    ),
    qsubs AS (SELECT vec_id AS query_id, m, sub FROM subs WHERE vec_id < 5),
    dtab AS (
      SELECT q.query_id, q.m, cb.cid, {d2_qc} AS dq
      FROM qsubs q JOIN cb ON cb.m = q.m
    ),
    scored AS (
      SELECT d.query_id, c.vec_id, round(sum(d.dq), 6) AS adc
      FROM codes c JOIN dtab d ON d.m = c.m AND d.cid = c.cid
      WHERE c.vec_id <> d.query_id
      GROUP BY d.query_id, c.vec_id
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc, vec_id) AS rn
        FROM scored)
      WHERE rn <= {_SHORTLIST}
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
    exact AS (
      SELECT s.query_id, s.vec_id, round({cos_qe}, 6) AS cosine
      FROM short s JOIN v ON v.vec_id = s.vec_id
                   JOIN q ON q.query_id = s.query_id
    )
    {_topk_tail()}
    """


def pq_oracle() -> str | None:
    meta = _meta()
    if not meta:
        return None
    return _pq_search_sql("SELECT vec_id, e FROM nv", "pq_codebooks", meta)


def opq_oracle() -> str | None:
    meta = _meta()
    if not meta:
        return None
    # rotate the unit vectors by the frozen R: rotated[j] = dot(e, R[j, :])
    space = f"""
      SELECT vec_id, list(x ORDER BY i) AS e FROM (
        SELECT nv.vec_id, rot.i, list_inner_product(nv.e, rot.r) AS x
        FROM nv CROSS JOIN (
          {_artifact_cte(meta, "opq_rotation")}
        ) rot)
      GROUP BY vec_id
    """
    return _pq_search_sql(space, "opq_pq", meta)


def ivfpq_oracle() -> str | None:
    meta = _meta()
    if not meta:
        return None
    d2_vc = _D2.format(a="nv.e", b="co.c", n=_DIMS)
    d2_qc = _D2.format(a="q.qe", b="co.c", n=_DIMS)
    d2_sc = _D2.format(a="s.sub", b="cb.c", n=_PQ_SUB)
    d2_rc = _D2.format(a="r.sub", b="cb.c", n=_PQ_SUB)
    cos_qe = _COS.format(a="q.qe", b="v.e")
    residual = f"list_transform(generate_series(1, {_DIMS}), i -> e[i] - c[i])"
    q_residual = f"list_transform(generate_series(1, {_DIMS}), i -> qe[i] - c[i])"
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    nv AS ({_NV}),
    co AS (
      {_artifact_cte(meta, "ivfpq_coarse")}
    ),
    cb AS (
      {_artifact_cte(meta, "ivfpq_pq")}
    ),
    assigned AS (
      SELECT vec_id, cid, {residual} AS e FROM (
        SELECT nv.vec_id, nv.e, co.cid, co.c,
               row_number() OVER (PARTITION BY nv.vec_id
                                  ORDER BY {d2_vc}, co.cid) AS rn
        FROM nv CROSS JOIN co)
      WHERE rn = 1
    ),
    subs AS (
      SELECT vec_id, cid, mm.m,
             list_slice(e, mm.m * {_PQ_SUB} + 1, mm.m * {_PQ_SUB} + {_PQ_SUB}) AS sub
      FROM assigned CROSS JOIN {_SUBSPACES} mm
    ),
    codes AS (
      SELECT vec_id, cid, m, pcid FROM (
        SELECT s.vec_id, s.cid, s.m, cb.cid AS pcid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {d2_sc}, cb.cid) AS rn
        FROM subs s JOIN cb ON cb.m = s.m)
      WHERE rn = 1
    ),
    qv AS (SELECT vec_id AS query_id, e AS qe FROM nv WHERE vec_id < 5),
    probe AS (
      SELECT query_id, cid, {q_residual} AS e FROM (
        SELECT q.query_id, co.cid, q.qe, co.c,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {d2_qc}, co.cid) AS brank
        FROM qv q CROSS JOIN co)
      WHERE brank <= {_NPROBE}
    ),
    qsubs AS (
      SELECT query_id, cid, mm.m,
             list_slice(e, mm.m * {_PQ_SUB} + 1, mm.m * {_PQ_SUB} + {_PQ_SUB}) AS sub
      FROM probe CROSS JOIN {_SUBSPACES} mm
    ),
    dtab AS (
      SELECT r.query_id, r.cid, r.m, cb.cid AS pcid, {d2_rc} AS dq
      FROM qsubs r JOIN cb ON cb.m = r.m
    ),
    scored AS (
      SELECT d.query_id, c.vec_id, round(sum(d.dq), 6) AS adc
      FROM codes c JOIN dtab d
        ON d.cid = c.cid AND d.m = c.m AND d.pcid = c.pcid
      WHERE c.vec_id <> d.query_id
      GROUP BY d.query_id, c.vec_id
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc, vec_id) AS rn
        FROM scored)
      WHERE rn <= {_SHORTLIST}
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
    exact AS (
      SELECT s.query_id, s.vec_id, round({cos_qe}, 6) AS cosine
      FROM short s JOIN v ON v.vec_id = s.vec_id
                   JOIN q ON q.query_id = s.query_id
    )
    {_topk_tail()}
    """


def mmr_oracle(
    query_vec: int = 0, lam: float = 0.7, n_cand: int = 50, n_select: int = 10
) -> str:
    """Fully-unrolled greedy MMR — no artifacts, valid at any SF.

    Mirrors similarity._mmr_greedy exactly: relevance = 6dp-rounded
    cosine to the query vector, candidates = top-``n_cand`` by
    (relevance DESC, vec_id), each pick maximizes
    round(lam*rel - (1-lam)*max_sim_to_selected, 6) with vec_id
    tie-break; ``(1 - {lam})`` is spelled as the same float expression
    Python evaluates so the weighted score is bit-identical before the
    6dp round. max_sim uses UN-rounded candidate-candidate cosines,
    like the Python reference."""
    cos_rel = _COS.format(a="q.qe", b="v.e")
    cos_cs = _COS.format(a="c.e", b="s.e")
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
    # sel_k -> sel_{k-1} chain would expand to ~2^k re-scans of the parquet
    # ("Too many open files"); materialization keeps each step O(n_cand).
    parts = [
        f"""
    WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT e AS qe FROM v WHERE vec_id = {query_vec}),
    cand AS MATERIALIZED (
      SELECT v.vec_id, round({cos_rel}, 6) AS rel, v.e
      FROM v CROSS JOIN q WHERE v.vec_id <> {query_vec}
      ORDER BY rel DESC, vec_id LIMIT {n_cand}
    ),
    pick1 AS MATERIALIZED (
      SELECT vec_id, rel, e, round({lam} * rel, 6) AS score
      FROM cand ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel1 AS MATERIALIZED (SELECT * FROM pick1)"""
    ]
    for k in range(2, n_select + 1):
        parts.append(f""",
    pick{k} AS MATERIALIZED (
      SELECT c.vec_id, c.rel, c.e,
             round({lam} * c.rel - (1 - {lam}) *
                   (SELECT max({cos_cs}) FROM sel{k - 1} s), 6) AS score
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
      ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    sel{k} AS MATERIALIZED (SELECT * FROM sel{k - 1} UNION ALL SELECT * FROM pick{k})""")
    ranks = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS rank, CAST(vec_id AS BIGINT) AS vec_id,"
        f" rel AS relevance, score AS mmr_score FROM pick{k}"
        for k in range(1, n_select + 1)
    )
    parts.append(f"\n    {ranks}\n    ORDER BY rank\n    ")
    return "".join(parts)
