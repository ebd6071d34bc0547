"""Entity resolution (record linkage) with token blocking.

The classic pipeline (Fellegi–Sunter / Dedoop-style, all public
literature): canonicalize → block → compare → match. A naive formulation
compares every record pair (corpus², dead at 100 TB); the scalable shape
used here:

1. **Canonicalize first**: group records by their name key. Comparisons
   then run over the DISTINCT name space, which is orders of magnitude
   smaller than the record space (64 names for 2 000 parts here; domain
   dictionaries at web scale behave the same way). The per-name record
   count rides along so match support is preserved.
2. **Token blocking**: candidate pairs must share ≥1 name token — a
   posting-list equi-join on the token, never an all-pairs product.
   Skewed hot tokens are the known failure mode; at larger scales add
   block purging (drop tokens with df above a cap) exactly as
   ``dedup_ngram_jaccard`` prunes hot shingles.
3. **Compare**: Levenshtein edit distance (JVM built-in `levenshtein`,
   whole-stage codegen; identical definition in DuckDB) with a
   threshold, evaluated only on blocked candidates.

Reference framing: the reference's streaming-SQL surface
(/root/reference/README.md:41-43) is the query layer this extends; entity
resolution is the canonical "join two dirty feeds" ask on such a stack.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_MAX_DIST = 3


@query(
    "entity_resolution_parts",
    oracle=f"""
    WITH names AS (SELECT p_name, count(*) AS n FROM part GROUP BY p_name),
    toks AS (SELECT p_name, n, unnest(string_split(p_name, ' ')) AS tok FROM names),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
                      a.n AS n_records_a, b.n AS n_records_b
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS edit_dist,
           CAST(n_records_a AS BIGINT) AS n_records_a,
           CAST(n_records_b AS BIGINT) AS n_records_b
    FROM cand
    WHERE levenshtein(name_a, name_b) <= {_MAX_DIST}
    ORDER BY edit_dist, name_a, name_b
    """,
    description=(
        "Entity resolution: canonicalize to the distinct name space, "
        "token-block candidates (posting-list equi-join, never all-pairs), "
        "Levenshtein-match survivors"
    ),
    bench=True,
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    # canonicalize: comparisons run over distinct names, record counts ride along
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
    toks = names.select(
        "p_name", "n", F.explode(F.split("p_name", " ")).alias("tok")
    )
    a = toks.select(
        F.col("p_name").alias("name_a"), F.col("n").alias("n_records_a"), "tok"
    )
    b = toks.select(
        F.col("p_name").alias("name_b"), F.col("n").alias("n_records_b"), "tok"
    )
    cand = (
        a.join(b, ["tok"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b", "n_records_a", "n_records_b")
        .distinct()
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= _MAX_DIST)
        .select("name_a", "name_b", "edit_dist", "n_records_a", "n_records_b")
        .orderBy("edit_dist", "name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# entity cluster formation over the match graph
# ---------------------------------------------------------------------------

_EC_ROUNDS = 4


def _ec_duck_round(i: int) -> str:
    """One min-label propagation round over the undirected match graph."""
    return f"""
    lbl{i} AS (
      SELECT n.name, least(n.lbl, coalesce(min(l.lbl), n.lbl)) AS lbl
      FROM lbl{i - 1} n
      LEFT JOIN edges e ON e.a = n.name
      LEFT JOIN lbl{i - 1} l ON l.name = e.b
      GROUP BY n.name, n.lbl
    )"""


@query(
    "entity_clusters_parts",
    oracle=f"""
    WITH names AS (SELECT p_name, count(*) AS n FROM part GROUP BY p_name),
    toks AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names),
    matches AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    ),
    edges AS (  -- undirected
      SELECT name_a AS a, name_b AS b FROM matches
      UNION ALL SELECT name_b, name_a FROM matches
    ),
    lbl0 AS (SELECT p_name AS name, p_name AS lbl FROM names),
    {",".join(_ec_duck_round(i) for i in range(1, _EC_ROUNDS + 1))}
    SELECT l.lbl AS canonical_name,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(nm.n) AS BIGINT) AS n_records
    FROM lbl{_EC_ROUNDS} l JOIN names nm ON nm.p_name = l.name
    GROUP BY l.lbl
    HAVING count(*) > 1
    ORDER BY canonical_name
    """,
    description=(
        "Entity cluster formation: min-label propagation over the "
        "blocked-match graph groups linked name variants under one "
        "canonical representative — the record-linkage end product"
    ),
)
def entity_clusters_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matches from the same blocking+Levenshtein pipeline as
    ``entity_resolution_parts`` become an undirected graph; four
    synchronous min-label rounds (pure integer/string min — exact in
    both engines) give each connected variant group its
    lexicographically-smallest name as the canonical id. Per round: one
    edges⋈labels hash join + a min groupBy (map-side combine) — the
    same cost envelope as ``label_prop_communities``; the label table is
    |distinct names|-sized, which canonicalization already made tiny
    relative to the record space."""
    (part,) = load(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
    toks = names.select("p_name", F.explode(F.split("p_name", " ")).alias("tok"))
    a = toks.select(F.col("p_name").alias("name_a"), "tok")
    b = toks.select(F.col("p_name").alias("name_b"), "tok")
    matches = (
        a.join(b, ["tok"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") <= _MAX_DIST)
    )
    edges = matches.select(
        F.col("name_a").alias("a"), F.col("name_b").alias("b")
    ).unionByName(
        matches.select(F.col("name_b").alias("a"), F.col("name_a").alias("b"))
    ).localCheckpoint()
    labels = names.select(F.col("p_name").alias("name"), F.col("p_name").alias("lbl"))
    for _ in range(_EC_ROUNDS):
        neigh = (
            edges.join(labels.select(F.col("name").alias("b"), F.col("lbl").alias("nlbl")), "b")
            .groupBy("a")
            .agg(F.min("nlbl").alias("minn"))
        )
        labels = (
            labels.join(neigh.select(F.col("a").alias("name"), "minn"), "name", "left")
            .select("name", F.least("lbl", F.coalesce("minn", "lbl")).alias("lbl"))
            .localCheckpoint()
        )
    return (
        labels.join(names, labels["name"] == names["p_name"])
        .groupBy(F.col("lbl").alias("canonical_name"))
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("n").cast("bigint").alias("n_records"),
        )
        .filter(F.col("n_names") > 1)
        .select(
            "canonical_name", F.col("n_names").cast("bigint").alias("n_names"), "n_records"
        )
        .orderBy("canonical_name")
    )
