"""Document deduplication operators (SURVEY.md §2.5 A6 + north-star M6).

Four tiers, each a real large-scale strategy:

- **exact**: md5-hash groupBy — one shuffle on the hash, no pairwise work.
- **n-gram Jaccard**: exact pairwise similarity via shingle-posting-list
  self-join — the posting-list join shuffles on the shingle, so cost is
  bounded by shingle collision counts (not |docs|²).
- **MinHash + LSH**: signature → band-bucket join → candidate pairs →
  exact Jaccard verify, the only member that survives 100 TB: pair
  generation is bounded by band-bucket collisions.
- **SimHash**: 32-bit fingerprints; near-dup = small Hamming distance.

All hashes derive from md5 (identical bytes in Spark and DuckDB), so every
step is oracle-verifiable — no engine-specific hash (murmur3, xxhash)
appears in the data path.

ANSI-mode note: Spark 4 runs ANSI SQL — ``element_at`` past array end
throws, so shingle index sequences are guarded; all modular arithmetic is
kept under 2^62 so bigint multiplication can't overflow in either engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# ---------------------------------------------------------------------------
# shared shingle machinery (3-token shingles over whitespace tokens)
# ---------------------------------------------------------------------------

# Spark-side 3-shingles per doc. element_at is 1-based (as in DuckDB).
# NOTE deliberately NOT array_distinct here: it's O(n²) per document
# (quadratic string equality); dedup happens via a shuffle-based
# .distinct() after explode instead, which scales.
_SHINGLES_EXPR = """
  CASE WHEN size(toks) >= 3
       THEN transform(sequence(1, size(toks) - 2),
                      i -> concat_ws(' ', element_at(toks, i),
                                          element_at(toks, i + 1),
                                          element_at(toks, i + 2)))
       ELSE array()
  END
"""

# DuckDB-side identical construction (lists are 1-based there too).
_SHINGLES_SQL = """
  list_distinct(CASE WHEN len(toks) >= 3
       THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             for i in range(1, len(toks) - 1)]
       ELSE [] END)
"""


def _doc_shingles(
    spark: SparkSession, sf_dir: str, hashed: bool = False
) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    # repartition by doc_id BEFORE the expensive per-doc work: a single
    # parquet file arrives as one task, which would serialize the
    # shingle+hash CPU onto one core (and one executor at cluster scale)
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # The cache() on the token projection is a hard optimizer barrier
    # (InMemoryRelation): without it Catalyst collapses the projections and
    # inlines split(text) into every element_at of the transform lambda —
    # re-tokenizing the document once per shingle, quadratic per doc
    # (measured 15.3s -> 1.7s at sf0.1 for the shingle stage).
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    # explode + distinct, NOT array_distinct: Spark's array_distinct is
    # O(k²) per doc for string arrays (non-primitive path) — fine for these
    # short synthetic docs, catastrophic for long documents. The distinct
    # here costs NO exchange: HashPartitioning(doc_id) from the repartition
    # above satisfies ClusteredDistribution(doc_id, sh) (partition keys ⊆
    # grouping keys), so the dedup aggregate runs partition-local — linear
    # per doc AND shuffle-free (A/B-measured faster than array_distinct at
    # sf0.1 steady-state: 1.35s vs 1.75s for the full minhash query).
    exploded = toks.select("doc_id", F.expr(_SHINGLES_EXPR).alias("shingles")).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    # hashed=True: xxhash64 BEFORE the distinct, for callers whose whole
    # downstream (joins, groupBys, set intersects) keys on the shingle
    # identity only — the dedup aggregate then hashes/compares primitive
    # longs instead of strings and any cache of the result holds 8 B
    # per shingle instead of the text (same 64-bit-collision argument as
    # the r6 dedup_jaccard_prefix hashing: ~1e-9 at 1e5 distinct
    # shingles, and a collision would surface in the cross-engine
    # oracle). Callers that need the TEXT (the md5-based MinHash family
    # — oracle-pinned to md5(shingle text)) keep the default.
    if hashed:
        exploded = exploded.select("doc_id", F.xxhash64("sh").alias("sh"))
    return exploded.distinct()


_SHINGLE_CTE = f"""
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh FROM tok)
"""


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY text_hash
    ORDER BY text_hash
    """,
    description="Exact dedup: hash-groupBy, keep min doc_id (SURVEY.md A6)",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return (
        documents.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("text_hash")
    )


@query(
    "dedup_canonical_documents",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS c
      FROM documents
    )
    SELECT md5(c) AS canon_hash, min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies,
           CAST(count(*) FILTER (WHERE c = '') AS BIGINT) AS n_empty
    FROM canon
    GROUP BY canon_hash
    ORDER BY canon_hash
    """,
    description=(
        "Canonicalization dedup (the near-exact pass between exact and "
        "fuzzy): lowercase, strip non-alphanumerics, collapse whitespace, "
        "THEN hash-groupBy — catches trivially-reformatted copies exact "
        "dedup misses without any pairwise work"
    ),
)
def dedup_canonical_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every production corpus pipeline runs this pass before fuzzy
    dedup: most 'near'-duplicates differ only in case/punctuation/
    whitespace, and normalizing first lets the O(n) hash-groupBy absorb
    them so the expensive LSH stage sees a smaller, genuinely-fuzzy
    residue. Pure map + one groupBy — identical scale shape to exact
    dedup. Normalization is plain ASCII-class regex (engine-identical);
    Unicode NFC would be the production extension point.
    """
    (documents,) = load(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), F.lit("[^a-z0-9 ]"), F.lit(" ")),
            F.lit(" +"),
            F.lit(" "),
        )
    )
    return (
        documents.select("doc_id", canon.alias("c"))
        .groupBy(F.md5(F.col("c").cast("binary")).alias("canon_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sum(F.when(F.col("c") == "", 1).otherwise(0))
            .cast("bigint")
            .alias("n_empty"),
        )
        .orderBy("canon_hash")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact pairwise via posting-list join)
# ---------------------------------------------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM pairs JOIN sz sa ON doc_a = sa.doc_id
               JOIN sz sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    description="Near-dup pairs by exact 3-shingle Jaccard >= 0.5 (posting-list join)",
    bench=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashed shingles: the posting-list self-join, both aggs, and the
    # size joins key on shingle identity only — longs, not strings
    # (guide §2.3 "narrower types"; r7 A/B 0.89 -> 0.66 s at sf0.1)
    sh = _doc_shingles(spark, sf_dir, hashed=True).cache()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        pairs.join(F.broadcast(sz.select(F.col("doc_id"), F.col("n").alias("na"))),
                   F.col("doc_a") == F.col("doc_id")).drop("doc_id")
        .join(F.broadcast(sz.select(F.col("doc_id"), F.col("n").alias("nb"))),
              F.col("doc_b") == F.col("doc_id")).drop("doc_id")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH dedup
# ---------------------------------------------------------------------------

# 16 universal-hash params (a*x + b mod p), p = 2^31-1; a,b fixed so the
# DuckDB oracle computes bit-identical signatures. a*x < 2^31 * 2^31 = 2^62.
_MH_P = 2147483647
_MH_PARAMS = [
    (1103515245, 12345), (1140671485, 12820163), (1664525, 1013904223),
    (22695477, 1), (65793, 4282663), (134775813, 1), (214013, 2531011),
    (16843009, 826366247), (69069, 1327217885), (1103527590, 377401575),
    (1229443, 351750571), (279470273, 102913196), (18000, 23894),
    (36969, 18273), (29943829, 1013904223), (302875107, 94906249),
]
_MH_BANDS = 4  # 4 bands x 4 rows

# hex60(md5(s)) → bigint, identically in both engines
_SPARK_H60 = "cast(conv(substr(md5(cast(sh as binary)), 1, 15), 16, 10) as bigint) % 2147483647"
_DUCK_H60 = "(('0x' || substr(md5(sh), 1, 15))::BIGINT) % 2147483647"


def _mh_spark_hashes() -> str:
    """Array of 16 minhash values as a Spark SQL expression over column x."""
    terms = ", ".join(f"({a}L * x + {b}L) % {_MH_P}L" for a, b in _MH_PARAMS)
    return f"array({terms})"


def _mh_duck_params_values() -> str:
    return ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(_MH_PARAMS)
    )


def _mh_signatures(sh: DataFrame) -> DataFrame:
    """Per-doc MinHash signature (doc_id, h0..h15): one groupBy(doc_id)
    computing all 16 minima as separate aggregates — no 16x row
    explosion, one shuffle instead of two."""
    hx = sh.withColumn("x", F.expr(_SPARK_H60))
    return hx.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"({a}L * x + {b}L) % {_MH_P}L")).alias(f"h{i}")
            for i, (a, b) in enumerate(_MH_PARAMS)
        ]
    )


def _mh_band_candidates(sh: DataFrame, sig: DataFrame | None = None) -> DataFrame:
    """MinHash band-collision candidate pairs over a (doc_id, sh) table —
    the LSH candidate stage, shared by dedup_minhash_lsh, the
    dedup_eval_metrics recall probe, and the calibration query
    (identical stage, same constants). A caller that also consumes the
    signature table passes its (cached) ``sig`` so the 16-min aggregate
    over every shingle runs once, not once per consumer."""
    rows_per_band = len(_MH_PARAMS) // _MH_BANDS
    cache_bands = sig is None
    if sig is None:
        sig = _mh_signatures(sh)
    # band signature = that band's minima as ROWS_PER_BAND bigint columns
    # (m0..m3); the self-join keys on them directly. The r6 version
    # concat_ws'd them into a string per (doc, band) — same collision
    # groups, but string allocation + string join keys where primitive
    # longs hash/compare for free (guide §2.3 "narrower types").
    band_cols = [
        F.struct(
            F.lit(band).alias("band"),
            *[
                F.col(f"h{band * rows_per_band + j}").alias(f"m{j}")
                for j in range(rows_per_band)
            ],
        )
        for band in range(_MH_BANDS)
    ]
    mkeys = [f"m{j}" for j in range(rows_per_band)]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", "b.band", *[f"b.{m}" for m in mkeys])
    # cache the band table before the self-join: its two sides are a
    # broadcast build and a streamed scan — DIFFERENT node types, so no
    # exchange/broadcast reuse applies and the 16-min signature
    # aggregate over every shingle would run TWICE, racing the sh cache
    # fill (r8; the same no-reuse trap as the r7 dedup_jaccard_prefix
    # prefix table, guide §1.2). |docs| x 4 narrow rows, bounded by the
    # corpus row count, never by pair mass. Callers that pass their own
    # (cached) sig already share the aggregate; the explode off a
    # cached sig is cheap enough not to re-cache.
    if cache_bands:
        bands = bands.cache()
    cond = (F.col("a.band") == F.col("b.band")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for m in mkeys:
        cond = cond & (F.col(f"a.{m}") == F.col(f"b.{m}"))
    return (
        bands.alias("a")
        .join(bands.alias("b"), cond)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    hx AS (SELECT doc_id, sh, {_DUCK_H60} AS x FROM sh),
    hp(i, a, b) AS (VALUES {_mh_duck_params_values()}),
    sig AS (
      SELECT doc_id, i, min((a * x + b) % {_MH_P}) AS minv
      FROM hx CROSS JOIN hp GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {len(_MH_PARAMS) // _MH_BANDS} AS band,
             string_agg(minv::VARCHAR, ',' ORDER BY i) AS band_sig
      FROM sig GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c JOIN sh x ON x.doc_id = c.doc_a
                  JOIN sh y ON y.doc_id = c.doc_b AND y.sh = x.sh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common JOIN sz sa ON doc_a = sa.doc_id
                JOIN sz sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.7
    ORDER BY doc_a, doc_b
    """,
    description="MinHash(16) + LSH(4 bands) candidates, exact-Jaccard verified >= 0.7 — the 100 TB dedup path",
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir).cache()
    cand = _mh_band_candidates(sh)
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # candidate-driven common-shingle count: cand ⋈ shingles(doc_a) ⋈ shingles(doc_b)
    sha = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        cand.join(sha, ["doc_a"]).join(shb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(F.broadcast(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))), ["doc_a"])
        .join(F.broadcast(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))), ["doc_b"])
        .filter(jac >= 0.7)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tc AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY doc_id, token),
    th AS (SELECT doc_id, cnt, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM tc),
    bits AS (
      SELECT doc_id, j,
             sum(cnt * (CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) AS s
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j)
      GROUP BY doc_id, j
    ),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b
    """,
    description="32-bit SimHash fingerprints; near-dup pairs at Hamming <= 3",
    bench=True,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    th = tc.withColumn(
        "h",
        F.expr("cast(conv(substr(md5(cast(token as binary)), 1, 8), 16, 10) as bigint)"),
    )
    # ONE 17-buffer aggregate computes all 32 bit-position sums (r8; the
    # r6 shape exploded every (doc, token) row 32x and paid an extra
    # (doc_id, j) shuffle + 32x hash-aggregate probes). Two identities:
    # the signed sum s_j = sum(cnt * (bit_j ? 1 : -1)) equals
    # 2*B_j - T with B_j = sum(cnt * bit_j), T = sum(cnt) — exact
    # integers, so s_j > 0  <=>  2*B_j > T; and B_j, B_{j+16} pack into
    # ONE 64-bit accumulator (B_j << 32 | B_{j+16}) with no carry while
    # tokens-per-doc < 2^31 (any real document is orders of magnitude
    # below). 16 packed buffers + T stays ON the Spark 4.1 codegen fast
    # path (the straight 32-buffer rewrite measured SLOWER in r7 — the
    # wide-aggregate cliff).
    packed = [
        F.sum(
            F.col("cnt")
            * F.expr(
                f"shiftleft(shiftright(h, {j}) & 1, 32)"
                f" + (shiftright(h, {j + 16}) & 1)"
            )
        ).alias(f"p{j}")
        for j in range(16)
    ]
    agg = th.groupBy("doc_id").agg(F.sum("cnt").alias("tot"), *packed)
    bit_terms = []
    for j in range(16):
        bit_terms.append(
            F.when(F.expr(f"2 * shiftright(p{j}, 32) > tot"), F.lit(1 << j))
            .otherwise(F.lit(0))
        )
        bit_terms.append(
            F.when(F.expr(f"2 * (p{j} & 4294967295) > tot"), F.lit(1 << (j + 16)))
            .otherwise(F.lit(0))
        )
    fp = agg.select(
        "doc_id", sum(bit_terms[1:], bit_terms[0]).cast("bigint").alias("simhash")
    )
    # Pigeonhole banding instead of the all-pairs self-join: split the
    # 32-bit fingerprint into 4 bands of 8 bits — any pair with hamming <= 3
    # differs in at most 3 bands, so AT LEAST ONE band matches exactly and a
    # band-equality join finds every qualifying pair. Candidates are band
    # collisions (O(collisions)), never |docs|² — same LSH structure as the
    # minhash path, and the reason this stays a 100 TB operator. Results are
    # identical to the quadratic formulation (the oracle still checks it).
    fp = fp.cache()
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("bandval", F.expr("shiftright(simhash, band * 8) & 255"))
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bandval") == F.col("y.bandval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# keep-best dedup — transitive clusters + quality-ranked keeper selection
# ---------------------------------------------------------------------------


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE
    {_SHINGLE_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ),
    near AS (
      SELECT doc_a, doc_b
      FROM prs JOIN sz sa ON doc_a = sa.doc_id
               JOIN sz sb ON doc_b = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM near
      UNION ALL SELECT doc_b, doc_a FROM near
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    walk(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node
      WHERE w.lbl < e.b
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM walk GROUP BY node),
    q AS (
      SELECT doc_id,
             round(0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                          / len(string_split(text, ' ')))
                   + 0.5 * least(len(string_split(text, ' ')) / 100.0, 1.0), 6)
               AS quality
      FROM documents
    )
    SELECT doc_id, component, quality,
           CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_keeper
    FROM (SELECT c.doc_id, c.component, q.quality,
                 row_number() OVER (PARTITION BY c.component
                                    ORDER BY q.quality DESC, c.doc_id) AS rn
          FROM comp c JOIN q USING (doc_id))
    ORDER BY component, doc_id
    """,
    description=(
        "Keep-best dedup: transitive near-dup clusters (3-shingle Jaccard "
        ">= 0.5 -> star CC) keep their HIGHEST-QUALITY member instead of "
        "the min id — the production curation policy (discard dups, keep "
        "the best-written copy)"
    ),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition query: exact-Jaccard near-dup pairs -> large-star/
    small-star components -> quality-scored keeper per cluster. The
    quality table is |docs| and joins on doc_id (same key the components
    carry), so beyond the dedup itself the only added exchange is the
    per-cluster ranking window. Keeper policy = argmax(quality, doc_id
    tie-break) — deterministic under the 6dp-rounded score.
    """
    from kafka_stream_spark.operators.components import connected_components_star
    from kafka_stream_spark.operators.text_analysis import text_quality_score

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_star(pairs)
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        labels.select(F.col("node").alias("doc_id"), "component")
        .join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id", "component", "quality",
            F.when(F.col("rn") == 1, 1).otherwise(0).alias("is_keeper"),
        )
        .orderBy("component", "doc_id")
    )


# ---------------------------------------------------------------------------
# Paragraph-chunk corpus dedup (C4/CCNet line-dedup shape)
# ---------------------------------------------------------------------------

_CHUNK = 10  # tokens per pseudo-paragraph (testdata docs carry no newlines)


@query(
    "paragraph_dedup_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS idx,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, idx // {_CHUNK} AS chunk_idx,
             string_agg(tok, ' ' ORDER BY idx) AS chunk_text
      FROM toks GROUP BY doc_id, idx // {_CHUNK}
    ),
    kept AS (
      SELECT doc_id, chunk_idx, chunk_text FROM (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (PARTITION BY chunk_text
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks) WHERE rn = 1
    ),
    tot AS (SELECT doc_id, count(*) AS n_total FROM chunks GROUP BY doc_id)
    SELECT t.doc_id, t.n_total, count(k.chunk_idx) AS n_kept,
           string_agg(k.chunk_text, ' ' ORDER BY k.chunk_idx) AS new_text
    FROM tot t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.n_total
    ORDER BY t.doc_id
    """,
    description=(
        "C4/CCNet-style paragraph-level exact dedup: 10-token chunks, "
        "corpus-wide first-occurrence keep (doc_id, chunk_idx order), "
        "documents reassembled from surviving chunks"
    ),
    bench=True,
)
def paragraph_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup — the C4 "discard duplicate three-sentence
    spans" / CCNet line-dedup shape, on deterministic 10-token chunks
    (the testdata corpus has no newlines to split on).

    Chunking is pure projection: slice() over the token array builds each
    chunk locally — no explode+groupBy re-aggregation, so token order
    never depends on collect_list ordering. The cache() on the token
    projection is the NOTES.md#5 optimizer barrier: without it
    CollapseProject inlines split(text) into every slice() of the
    transform lambda (re-tokenizing per chunk, quadratic per doc).

    Corpus-wide first-keep = ONE shuffle partitioned by chunk_text (the
    window), then reassembly is one groupBy(doc_id) whose collect_list
    holds at most the doc's own chunks — per-doc memory, not corpus.
    At 100 TB: hash-partition by chunk text ~ uniformly distributes
    (chunks are high-entropy); the reassembly shuffle carries surviving
    chunks only.
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks) / {_CHUNK}.0) as int) - 1),"
                f" i -> array_join(slice(toks, i * {_CHUNK} + 1, {_CHUNK}), ' '))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_idx")
    kept = (
        chunks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    tot = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_total"))
    kept_agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("new_text"),
    )
    return (
        tot.join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "new_text",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Boilerplate-chunk stripping (RefinedWeb/CCNet line-frequency filter)
# ---------------------------------------------------------------------------

_BP_CHUNK = 4   # tokens per chunk (short enough to recur in the corpus)
_BP_MIN_DOCS = 3  # a chunk in >= this many docs is template boilerplate


def _bp_chunk_docs(documents: DataFrame, ncpu: int) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text): the shared 4-token chunker —
    used by the batch operator and by the boilerplate-set trainer the
    streaming gate consumes (streaming/boilerplate_gate.py)."""
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks) / {_BP_CHUNK}.0) as int) - 1),"
                f" i -> array_join(slice(toks, i * {_BP_CHUNK} + 1, {_BP_CHUNK}), ' '))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )


def boilerplate_chunk_set(documents: DataFrame) -> DataFrame:
    """The trained template set: (chunk_text) rows for chunks occurring
    in >= _BP_MIN_DOCS distinct documents. Heavy-hitter sized; collect
    it for the streaming gate's broadcast literal."""
    ncpu = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        _bp_chunk_docs(documents, ncpu)
        .groupBy("chunk_text")
        .agg(F.countDistinct("doc_id").alias("ndc"))
        .filter(F.col("ndc") >= _BP_MIN_DOCS)
        .select("chunk_text")
    )


@query(
    "strip_boilerplate_chunks",
    bench=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS idx,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, idx // {_BP_CHUNK} AS chunk_idx,
             string_agg(tok, ' ' ORDER BY idx) AS chunk_text
      FROM toks GROUP BY doc_id, idx // {_BP_CHUNK}
    ),
    boiler AS (
      SELECT chunk_text FROM (
        SELECT chunk_text, count(DISTINCT doc_id) AS ndc
        FROM chunks GROUP BY chunk_text)
      WHERE ndc >= {_BP_MIN_DOCS}
    ),
    kept AS (
      SELECT c.* FROM chunks c
      WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.chunk_text = c.chunk_text)
    ),
    tot AS (SELECT doc_id, count(*) AS n_total FROM chunks GROUP BY doc_id)
    SELECT t.doc_id, t.n_total,
           CAST(t.n_total - count(k.chunk_idx) AS BIGINT) AS n_removed,
           string_agg(k.chunk_text, ' ' ORDER BY k.chunk_idx) AS new_text
    FROM tot t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.n_total
    ORDER BY t.doc_id
    """,
    description=(
        "Boilerplate stripping (RefinedWeb/CCNet line-frequency filter): "
        "4-token chunks occurring in >=3 distinct documents are template "
        "boilerplate, removed from EVERY document (unlike paragraph "
        "dedup's first-keep); documents reassembled from what survives"
    ),
)
def strip_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of sub-document curation: `paragraph_dedup_documents`
    keeps one copy of repeated content, this REMOVES recurring template
    chunks (nav bars, cookie banners, footers) from all carriers — the
    CCNet/RefinedWeb "line appears in many documents → drop it" rule.

    Scale shape: chunking is the same local projection as paragraph
    dedup (no explode+regroup); the frequency pass is one chunk-keyed
    groupBy with map-side combine; the boilerplate set is heavy-hitter
    sized by construction (chunks in >= k docs), so the removal join
    BROADCASTS it as a left-anti hash join — the corpus is never
    re-shuffled for the filter. At 100 TB the frequency pass's output
    can be further gated by a count-min sketch before the exact count
    (only sketch-heavy chunks enter the groupBy).
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    chunks = _bp_chunk_docs(documents, ncpu)
    boiler = (
        chunks.groupBy("chunk_text")
        .agg(F.countDistinct("doc_id").alias("ndc"))
        .filter(F.col("ndc") >= _BP_MIN_DOCS)
        .select("chunk_text")
    )
    kept = chunks.join(F.broadcast(boiler), "chunk_text", "left_anti")
    tot = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_total"))
    kept_agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("new_text"),
    )
    return (
        tot.join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_total",
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            "new_text",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (PPJoin-style candidate pruning)
# ---------------------------------------------------------------------------

_PF_T = 0.5  # same threshold as dedup_ngram_jaccard — same result set


@query(
    "dedup_jaccard_prefix",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM pairs JOIN sz sa ON doc_a = sa.doc_id
               JOIN sz sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {_PF_T}
    ORDER BY doc_a, doc_b
    """,
    description=(
        "Same result as dedup_ngram_jaccard (exact 3-shingle Jaccard >= "
        "0.5) but candidates come only from rare-first token PREFIXES "
        "(PPJoin filter: |d| - ceil(t|d|) + 1), not every shared shingle"
    ),
    bench=True,
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix filtering (Chaudhuri et al. SSJoin / Xiao et al. PPJoin,
    both public papers): order every doc's shingles by global frequency
    (rarest first, shingle-text tiebreak — a total order), keep only the
    first |d| - ceil(t·|d|) + 1 as the doc's *prefix*. Any pair with
    Jaccard >= t MUST share a prefix token (pigeonhole on the suffix
    size), so the posting-list self-join runs over prefixes only —
    the frequent shingles that dominate posting-list collision cost
    never generate candidates. Verification then computes exact Jaccard
    on the (small) candidate set, identical to the full join's result.

    Exchanges: freq groupBy(sh), the rank window on doc_id, the prefix
    self-join on sh, and the candidate-restricted posting join — all
    hash joins keyed on shingle or doc id; nothing is ever |docs|².
    Two PPJoin filters bound the candidate set: the prefix (rarest
    shingles only) and the length filter (J >= t forces t·|A| <= |B| <=
    |A|/t, checked as exact integer arithmetic inside the join
    condition). Verification intersects the two docs' shingle sets per
    candidate pair (array_intersect over collected per-doc sets) — work
    is |candidates| × set size, strictly candidate-bounded; the full
    posting lists are never self-joined outside the prefix stage.
    `test_prefix_filter_prunes_candidates` asserts the candidate count
    strictly drops vs. the all-shared-shingles join on the same corpus;
    `test_prefix_verify_is_candidate_bounded` asserts the physical plan
    contains exactly one shingle-keyed self-join (the prefix stage).
    """
    # Hash shingles to 64-bit once: every downstream op (freq groupBy,
    # prefix self-join, per-pair array_intersect) then runs on primitive
    # longs instead of strings — the intersect takes Spark's primitive
    # fast path and join keys hash without byte comparisons. The prefix
    # theorem needs only a consistent TOTAL order, so (f, hash) works as
    # well as (f, text); verification stays exact (a 64-bit collision
    # merging two of ~10^5 distinct shingles has probability ~1e-9 and
    # would surface in the cross-engine oracle immediately).
    sh = _doc_shingles(spark, sf_dir, hashed=True).cache()
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    wd = Window.partitionBy("doc_id")
    ranked = (
        sh.join(freq, "sh")
        .select(
            "doc_id",
            "sh",
            F.row_number().over(wd.orderBy("f", "sh")).alias("r"),
            F.count(F.lit(1)).over(wd).alias("n"),
        )
    )
    # ceil(t*n) with t=0.5 in exact integer math: (n+1) div 2.
    # cache(): the self-join below consumes prefix on BOTH sides — one as
    # a broadcast build, one streamed — and those are different node
    # types, so no exchange/broadcast reuse applies and the freq-join +
    # rank-window pipeline would run twice (r7, guide §1.2).
    prefix = ranked.filter(
        F.col("r") <= F.col("n") - ((F.col("n") + 1) / 2).cast("long") + 1
    ).select("doc_id", "sh", "n", "r").cache()
    # PAIR-level PPJoin positional bound (Xiao et al. §3.2, aggregated
    # over ALL shared prefix tokens — r8, strictly tighter than the r7
    # per-occurrence test). Ranks follow ONE global total order (f, sh)
    # in every doc, so the matched prefix tokens of a pair sort
    # identically on both sides; let w be the matched token with the
    # LARGEST global order, at ranks (ra, rb). Any common token u < w
    # sits at rank < ra <= |prefix_A| in A and < rb <= |prefix_B| in B
    # — i.e. inside BOTH prefixes — hence u is itself one of the c
    # matches. Every other common token is > w, at rank > ra in A and
    # > rb in B, so there are at most min(|A|-ra, |B|-rb) of them:
    #     overlap <= c + min(|A| - max(r_a), |B| - max(r_b)).
    # J >= t forces overlap >= ceil(t/(1+t)·(|A|+|B|)) — t=0.5 gives
    # alpha = (n_a+n_b+2) div 3, integer-exact — so dropping pairs whose
    # bound falls below alpha loses no qualifying pair. Counting c
    # requires ALL shared-prefix occurrences, so the join keeps only
    # the (pair-constant) length filter and the positional test moves
    # into the pair aggregate (same exchange count: the groupBy replaces
    # the old .distinct()'s aggregation). Measured at sf0.1: 309 983
    # colliding pairs -> 119 678 candidates (the r7 per-occurrence test
    # kept 124 839). Positional filters cannot cut deeper on THIS
    # collision structure — collisions come from rare shingles at EARLY
    # prefix ranks, where the min(n - r) suffix allowance is near the
    # whole doc; a full Xiao-et-al suffix filter would cost O(n) probes
    # per pair, the same as the array_intersect verify it would avoid
    # (worthwhile only when sets are huge and the verify dwarfs the
    # probe — not at 50-shingle docs).
    alpha = ((F.col("na") + F.col("nb") + 2) / 3).cast("long")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter, t=0.5: |B| in [|A|/2, 2|A|] — integer-exact
            & (F.col("b.n") * 2 >= F.col("a.n"))
            & (F.col("b.n") <= F.col("a.n") * 2),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(F.col("a.r")).alias("ra"),
            F.max(F.col("b.r")).alias("rb"),
            F.first(F.col("a.n")).alias("na"),
            F.first(F.col("b.n")).alias("nb"),
        )
        .filter(
            F.col("c")
            + F.least(F.col("na") - F.col("ra"), F.col("nb") - F.col("rb"))
            >= alpha
        )
        .select("doc_a", "doc_b")
    )
    # Verify by per-doc shingle-set intersection over the candidate pairs
    # only. The groupBy(doc_id) reuses _doc_shingles' HashPartitioning
    # (shuffle-free), and the verify work is |candidates| x set-intersect
    # — the hot-shingle O(f²) posting collision mass never re-enters
    # after the prefix stage (the round-1 version re-joined the FULL
    # posting lists and semi-filtered after, re-materializing exactly
    # the mass the prefix filter exists to avoid).
    docsets = sh.groupBy("doc_id").agg(F.collect_list("sh").alias("shs"))
    # The final groupBy is a no-op on data (cand is distinct) but an
    # optimizer barrier: without it PushDownPredicates fuses the jaccard
    # filter into the join condition and array_intersect evaluates ~4x
    # per pair (once per reference) — measured 2x slower at sf0.1.
    scored = (
        cand.join(
            docsets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sh_a")),
            ["doc_a"],
        )
        .join(
            docsets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sh_b")),
            ["doc_b"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.first(F.size(F.array_intersect("sh_a", "sh_b"))).alias("n_common"),
            F.first(F.size("sh_a")).alias("na"),
            F.first(F.size("sh_b")).alias("nb"),
        )
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        scored.filter(jac >= _PF_T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# LSH recall evaluation (the S-curve as a query)
# ---------------------------------------------------------------------------


@query(
    "dedup_eval_metrics",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ),
    truth AS (
      SELECT doc_a, doc_b,
             round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
      FROM pairs JOIN sz sa ON doc_a = sa.doc_id
                 JOIN sz sb ON doc_b = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ),
    hx AS (SELECT doc_id, sh, {_DUCK_H60} AS x FROM sh),
    hp(i, a, b) AS (VALUES {_mh_duck_params_values()}),
    sig AS (
      SELECT doc_id, i, min((a * x + b) % {_MH_P}) AS minv
      FROM hx CROSS JOIN hp GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {len(_MH_PARAMS) // _MH_BANDS} AS band,
             string_agg(minv::VARCHAR, ',' ORDER BY i) AS band_sig
      FROM sig GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    bucketed AS (
      SELECT CAST(floor(t.jaccard * 10) AS INT) / 10.0 AS bucket_lo,
             count(*) AS n_truth,
             count(c.doc_a) AS n_hit
      FROM truth t LEFT JOIN cand c
        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
      GROUP BY bucket_lo
    )
    SELECT bucket_lo, n_truth, n_hit,
           round(n_hit * 1.0 / n_truth, 6) AS recall
    FROM bucketed ORDER BY bucket_lo
    """,
    description=(
        "LSH recall S-curve as a query: per exact-Jaccard bucket, the "
        "fraction of true near-dup pairs (J >= 0.5) the MinHash band "
        "candidate stage surfaces"
    ),
)
def dedup_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality monitoring for the dedup path (the twin of
    ann_eval_metrics for retrieval): the truth side is the exact
    posting-list join, the candidate side is the SAME band stage the
    production dedup runs (shared helper), and the output is recall by
    similarity bucket — the empirical LSH S-curve. Run at a sampled SF
    in production; the truth join is the cost the sketch exists to
    avoid.
    """
    sh = _doc_shingles(spark, sf_dir).cache()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    truth = (
        pairs.join(
            F.broadcast(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))),
            ["doc_a"],
        )
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))),
            ["doc_b"],
        )
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    cand = _mh_band_candidates(sh).withColumn("hit", F.lit(1))
    return (
        truth.join(cand, ["doc_a", "doc_b"], "left")
        .groupBy(
            (F.floor(F.col("jaccard") * 10).cast("int") / 10.0).alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("hit").alias("n_hit"),
        )
        .select(
            "bucket_lo",
            "n_truth",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_truth"), 6).alias("recall"),
        )
        .orderBy("bucket_lo")
    )


# ---------------------------------------------------------------------------
# containment dedup (asymmetric |A∩B|/|A| — catches subset duplication)
# ---------------------------------------------------------------------------


@query(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / sa.n, 6) AS containment_a,
           round(n_common * 1.0 / sb.n, 6) AS containment_b,
           CASE WHEN sa.n <= sb.n THEN doc_a ELSE doc_b END AS contained_doc
    FROM pairs JOIN sz sa ON doc_a = sa.doc_id
               JOIN sz sb ON doc_b = sb.doc_id
    WHERE greatest(n_common * 1.0 / sa.n, n_common * 1.0 / sb.n) >= 0.9
    ORDER BY doc_a, doc_b
    """,
    description=(
        "Asymmetric containment dedup: pairs where >= 90% of one side's "
        "3-shingles appear in the other — catches a short document "
        "embedded in a longer one, which symmetric Jaccard misses"
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment C(A->B) = |sh(A) ∩ sh(B)| / |sh(A)| (Broder 1997's
    second resemblance measure — public): quote/subset duplication where
    Jaccard stays low because the sizes differ. Same exact posting-list
    join as `dedup_ngram_jaccard` (one shuffle on the shingle key, one
    pair groupBy); at 100 TB the candidate generator swaps to
    MinHash-LSH keyed on the SMALLER side's signature (containment LSH),
    leaving this verify stage unchanged. Sizes broadcast (|docs| rows).
    """
    sh = _doc_shingles(spark, sf_dir).cache()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = F.col("n_common") / F.col("na")
    cb = F.col("n_common") / F.col("nb")
    return (
        pairs.join(
            F.broadcast(sz.select(F.col("doc_id"), F.col("n").alias("na"))),
            F.col("doc_a") == F.col("doc_id"),
        )
        .drop("doc_id")
        .join(
            F.broadcast(sz.select(F.col("doc_id"), F.col("n").alias("nb"))),
            F.col("doc_b") == F.col("doc_id"),
        )
        .drop("doc_id")
        .filter(F.greatest(ca, cb) >= 0.9)
        .select(
            "doc_a",
            "doc_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# incremental dedup (new batch vs existing corpus — the ingestion gate)
# ---------------------------------------------------------------------------

_INC_SRC = "src5"  # the arriving batch; every other source is the corpus
_INC_T = 0.7  # same verify threshold as dedup_minhash_lsh


@query(
    "incremental_dedup_documents",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    inc AS (SELECT doc_id, md5(text) AS h FROM documents WHERE source = '{_INC_SRC}'),
    base AS (SELECT doc_id, md5(text) AS h FROM documents WHERE source <> '{_INC_SRC}'),
    exact AS (
      SELECT i.doc_id, min(b.doc_id) AS matched_doc_id
      FROM inc i JOIN base b ON b.h = i.h GROUP BY i.doc_id
    ),
    hx AS (SELECT doc_id, sh, {_DUCK_H60} AS x FROM sh),
    hp(i, a, b) AS (VALUES {_mh_duck_params_values()}),
    sig AS (
      SELECT doc_id, i, min((a * x + b) % {_MH_P}) AS minv
      FROM hx CROSS JOIN hp GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {len(_MH_PARAMS) // _MH_BANDS} AS band,
             string_agg(minv::VARCHAR, ',' ORDER BY i) AS band_sig
      FROM sig GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS inc_doc, b.doc_id AS base_doc
      FROM bands a
      JOIN inc i ON i.doc_id = a.doc_id
      JOIN bands b ON b.band = a.band AND b.band_sig = a.band_sig
      JOIN base bb ON bb.doc_id = b.doc_id
      WHERE a.doc_id NOT IN (SELECT doc_id FROM exact)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.inc_doc, c.base_doc, count(*) AS n_common
      FROM cand c JOIN sh x ON x.doc_id = c.inc_doc
                  JOIN sh y ON y.doc_id = c.base_doc AND y.sh = x.sh
      GROUP BY c.inc_doc, c.base_doc
    ),
    near_all AS (
      SELECT inc_doc, base_doc,
             round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jac
      FROM common JOIN sz sa ON inc_doc = sa.doc_id
                  JOIN sz sb ON base_doc = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {_INC_T}
    ),
    near AS (
      SELECT inc_doc AS doc_id, base_doc AS matched_doc_id, jac
      FROM (SELECT *, row_number() OVER (PARTITION BY inc_doc
                                         ORDER BY jac DESC, base_doc) AS rn
            FROM near_all)
      WHERE rn = 1
    )
    SELECT i.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                WHEN n.doc_id IS NOT NULL THEN 'near'
                ELSE 'new' END AS verdict,
           coalesce(e.matched_doc_id, n.matched_doc_id) AS matched_doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 1.0 ELSE n.jac END AS best_jaccard
    FROM inc i
    LEFT JOIN exact e ON e.doc_id = i.doc_id
    LEFT JOIN near n ON n.doc_id = i.doc_id
    ORDER BY i.doc_id
    """,
    description=(
        "Incremental ingestion dedup: the arriving batch (one source) "
        "gated against the existing corpus — exact md5 layer, then "
        "cross-corpus MinHash-LSH candidates verified at Jaccard >= "
        "0.7; per-doc verdict exact/near/new with best corpus match"
    ),
    bench=True,
)
def incremental_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'don't re-ingest what you already have' gate every growing
    training corpus runs per crawl drop. Precedence: exact md5 match
    wins, else the best LSH-verified near match, else 'new'.

    Scale shape: the exact layer is a hash equi-join on a 16-byte key;
    the near layer reuses `_mh_band_candidates`' machinery with the
    band join RESTRICTED to incoming x corpus (never corpus x corpus —
    the candidate mass scales with the BATCH, not the corpus, which is
    what makes nightly increments affordable); the verify join is
    candidate-bounded exactly like dedup_minhash_lsh. At 100 TB the
    corpus-side band table and md5 set are precomputed artifacts
    (written once, bucketed by band_sig / hash), so an increment
    touches only matching buckets.
    """
    (documents,) = load(spark, sf_dir, "documents")
    is_inc = F.col("source") == _INC_SRC
    hashes = documents.select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("h")
    )
    inc = hashes.filter(is_inc).select("doc_id", "h")
    base = hashes.filter(~is_inc).select(
        F.col("doc_id").alias("bdoc"), F.col("h")
    )
    exact = (
        inc.join(base, "h")
        .groupBy("doc_id")
        .agg(F.min("bdoc").alias("matched_doc_id"))
    )

    sh = _doc_shingles(spark, sf_dir).cache()
    rows_per_band = len(_MH_PARAMS) // _MH_BANDS
    hx = sh.withColumn("x", F.expr(_SPARK_H60))
    sig = hx.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"({a}L * x + {b}L) % {_MH_P}L")).alias(f"h{i}")
            for i, (a, b) in enumerate(_MH_PARAMS)
        ]
    )
    # band minima as ROWS_PER_BAND bigint key columns, not a concat_ws
    # string — same collision groups, primitive join keys (the same r7
    # change as _mh_band_candidates; guide §2.3 "narrower types")
    band_cols = [
        F.struct(
            F.lit(band).alias("band"),
            *[
                F.col(f"h{band * rows_per_band + j}").alias(f"m{j}")
                for j in range(rows_per_band)
            ],
        )
        for band in range(_MH_BANDS)
    ]
    mkeys = [f"m{j}" for j in range(rows_per_band)]
    bands = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", "b.band", *[f"b.{m}" for m in mkeys]
    )
    side = documents.select("doc_id", is_inc.alias("is_inc"))
    # cache: the band table fans out into binc (broadcast build of the
    # cross-corpus join) and bbase (streamed side) — different node
    # types, no reuse, so the 16-min signature aggregate would run
    # twice (r8, same fix as _mh_band_candidates). |docs| x 4 rows.
    bands = bands.join(F.broadcast(side), "doc_id").cache()
    binc = bands.filter(F.col("is_inc")).join(
        exact.select("doc_id"), "doc_id", "left_anti"
    )
    bbase = bands.filter(~F.col("is_inc"))
    cond = F.col("a.band") == F.col("b.band")
    for m in mkeys:
        cond = cond & (F.col(f"a.{m}") == F.col(f"b.{m}"))
    cand = (
        binc.alias("a")
        .join(bbase.alias("b"), cond)
        .select(F.col("a.doc_id").alias("inc_doc"), F.col("b.doc_id").alias("base_doc"))
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col("doc_id").alias("inc_doc"), "sh")
    shb = sh.select(F.col("doc_id").alias("base_doc"), "sh")
    common = (
        cand.join(sha, ["inc_doc"])
        .join(shb, ["base_doc", "sh"])
        .groupBy("inc_doc", "base_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    near_all = (
        common.join(
            F.broadcast(sz.select(F.col("doc_id").alias("inc_doc"), F.col("n").alias("na"))),
            ["inc_doc"],
        )
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("base_doc"), F.col("n").alias("nb"))),
            ["base_doc"],
        )
        .filter(jac >= _INC_T)
        .select("inc_doc", "base_doc", F.round(jac, 6).alias("jac"))
    )
    wbest = Window.partitionBy("inc_doc").orderBy(F.desc("jac"), F.asc("base_doc"))
    near = (
        near_all.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("inc_doc").alias("doc_id"),
            F.col("base_doc").alias("near_match"),
            "jac",
        )
    )
    return (
        inc.select("doc_id")
        .join(F.broadcast(exact), "doc_id", "left")
        .join(F.broadcast(near), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("matched_doc_id").isNotNull(), F.lit("exact"))
            .when(F.col("near_match").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce(F.col("matched_doc_id"), F.col("near_match")).alias(
                "matched_doc_id"
            ),
            F.when(F.col("matched_doc_id").isNotNull(), F.lit(1.0))
            .otherwise(F.col("jac"))
            .alias("best_jaccard"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# edit-distance dedup (LSH candidates, bounded Levenshtein verify)
# ---------------------------------------------------------------------------

_ED_WIN = 256  # verification window (chars): bounds the O(n*m) DP per pair
_ED_MAX = 0.2  # normalized edit-distance acceptance threshold


@query(
    "dedup_edit_distance",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    hx AS (SELECT doc_id, sh, {_DUCK_H60} AS x FROM sh),
    hp(i, a, b) AS (VALUES {_mh_duck_params_values()}),
    sig AS (
      SELECT doc_id, i, min((a * x + b) % {_MH_P}) AS minv
      FROM hx CROSS JOIN hp GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {len(_MH_PARAMS) // _MH_BANDS} AS band,
             string_agg(minv::VARCHAR, ',' ORDER BY i) AS band_sig
      FROM sig GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    win AS (SELECT doc_id, substr(text, 1, {_ED_WIN}) AS t FROM documents),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             levenshtein(wa.t, wb.t) AS edit_dist,
             greatest(length(wa.t), length(wb.t)) AS span
      FROM cand c JOIN win wa ON wa.doc_id = c.doc_a
                  JOIN win wb ON wb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, edit_dist,
           round(edit_dist * 1.0 / span, 6) AS norm_dist
    FROM verified
    WHERE edit_dist * 1.0 / span <= {_ED_MAX}
    ORDER BY doc_a, doc_b
    """,
    description=(
        "Near-dup via edit distance: MinHash-LSH candidates verified by "
        "windowed Levenshtein <= 0.2 normalized — the character-level "
        "complement to token-Jaccard verification (catches reorder-free "
        "edits token shingles overweight)"
    ),
    bench=True,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded candidates + bounded-window Levenshtein verification.

    Scale shape: candidate generation is the same banded equi-join as
    ``dedup_minhash_lsh`` (never all-pairs); verification is one
    candidate-bounded join against a ``substr(text, 1, 256)`` window
    projection, so the DP cost per pair is capped at 256x256 regardless
    of document length (production edit-distance dedup windows for
    exactly this reason — full-text Levenshtein is O(len^2) and
    unboundable at 100 TB). ``levenshtein`` runs JVM-side (codegen).
    Engine-parity caveat: DuckDB's levenshtein counts bytes, Spark's
    counts characters — identical on this ASCII corpus; a non-ASCII
    corpus would need a byte-cast normalization on the Spark side.
    """
    sh = _doc_shingles(spark, sf_dir)
    cand = _mh_band_candidates(sh)
    (documents,) = load(spark, sf_dir, "documents")
    win = documents.select(
        "doc_id", F.substring("text", 1, _ED_WIN).alias("t")
    )
    wa = win.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    wb = win.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    nd = F.col("edit_dist") / F.col("span")
    return (
        cand.join(wa, ["doc_a"]).join(wb, ["doc_b"])
        .select(
            "doc_a", "doc_b",
            F.levenshtein("ta", "tb").alias("edit_dist"),
            F.greatest(F.length("ta"), F.length("tb")).alias("span"),
        )
        .filter(nd <= _ED_MAX)
        .select("doc_a", "doc_b", "edit_dist", F.round(nd, 6).alias("norm_dist"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "minhash_estimate_calibration",
    bench=True,
    oracle=f"""
    WITH {_SHINGLE_CTE},
    hx AS (SELECT doc_id, sh, {_DUCK_H60} AS x FROM sh),
    hp(i, a, b) AS (VALUES {_mh_duck_params_values()}),
    sig AS (
      SELECT doc_id, i, min((a * x + b) % {_MH_P}) AS minv
      FROM hx CROSS JOIN hp GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {len(_MH_PARAMS) // _MH_BANDS} AS band,
             string_agg(minv::VARCHAR, ',' ORDER BY i) AS band_sig
      FROM sig GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.doc_a, c.doc_b,
             count(CASE WHEN x.minv = y.minv THEN 1 END) AS n_match
      FROM cand c JOIN sig x ON x.doc_id = c.doc_a
                  JOIN sig y ON y.doc_id = c.doc_b AND y.i = x.i
      GROUP BY c.doc_a, c.doc_b
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c JOIN sh x ON x.doc_id = c.doc_a
                  JOIN sh y ON y.doc_id = c.doc_b AND y.sh = x.sh
      GROUP BY c.doc_a, c.doc_b
    ),
    pairj AS (
      SELECT e.doc_a, e.doc_b, e.n_match,
             CAST(round(1000000.0 * COALESCE(cm.n_common, 0)
                  / (sa.n + sb.n - COALESCE(cm.n_common, 0)), 0) AS BIGINT)
               AS jac_u
      FROM est e
      LEFT JOIN common cm ON cm.doc_a = e.doc_a AND cm.doc_b = e.doc_b
      JOIN sz sa ON e.doc_a = sa.doc_id
      JOIN sz sb ON e.doc_b = sb.doc_id
    )
    SELECT least(n_match // 2, 7) AS est_bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(n_match) * 1.0 / count(*) / 16, 6) AS avg_est_jaccard,
           round(sum(jac_u) * 1.0 / count(*) / 1000000, 6) AS avg_exact_jaccard
    FROM pairj
    GROUP BY est_bin
    ORDER BY est_bin
    """,
    description=(
        "MinHash estimator calibration: for every LSH candidate pair, the "
        "signature-agreement Jaccard estimate vs the exact shingle "
        "Jaccard, binned by estimate — measures the sketch the dedup "
        "pipeline trusts instead of guessing (eighth-bins of the 16-row "
        "signature)"
    ),
)
def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same signatures, bands, and candidate stage as dedup_minhash_lsh
    (shared helpers — the estimator audited IS the production one).
    Exact Jaccard mints an integer micro-unit per pair before any
    averaging, so bin aggregates are exact-integer sums with one
    fixed-shape division at the end."""
    # cache the signature table (|docs| x 17 narrow columns) so the
    # shingle-wide 16-min aggregate runs ONCE for its two consumers
    # (band candidates + per-pair agreement estimate) — there is no
    # exchange between them for ReuseExchange to dedup (guide §1.2:
    # don't compute things twice)
    sh = _doc_shingles(spark, sf_dir).cache()
    sig = _mh_signatures(sh).cache()
    # NOTE (r8, measured-and-rejected): caching cand here — it fans out
    # into est + common — A/B'd SLOWER (1.62 -> 1.99 s): the duplicated
    # subtree below the fan-out is only the band explode + self-join +
    # distinct over the already-cached sig, and the eager cache fill
    # barrier costs more than recomputing it twice.
    cand = _mh_band_candidates(sh, sig=sig)
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"h{i}").alias(f"a{i}") for i in range(len(_MH_PARAMS))])
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"h{i}").alias(f"b{i}") for i in range(len(_MH_PARAMS))])
    n_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(len(_MH_PARAMS))
    )
    est = (
        cand.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", n_match.alias("n_match"))
    )
    shx = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    shy = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        cand.join(shx, ["doc_a"]).join(shy, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    pairj = (
        est.join(common, ["doc_a", "doc_b"], "left")
        .join(F.broadcast(sz.select(F.col("doc_id").alias("doc_a"),
                                    F.col("n").alias("na"))), ["doc_a"])
        .join(F.broadcast(sz.select(F.col("doc_id").alias("doc_b"),
                                    F.col("n").alias("nb"))), ["doc_b"])
        .select(
            "n_match",
            F.round(1000000.0 * nc / (F.col("na") + F.col("nb") - nc), 0)
            .cast("bigint").alias("jac_u"),
        )
    )
    return (
        pairj.groupBy(
            F.least(F.floor(F.col("n_match") / 2), F.lit(7)).cast("bigint")
            .alias("est_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("n_match") * 1.0 / F.count(F.lit(1)) / 16, 6).alias(
                "avg_est_jaccard"
            ),
            F.round(F.sum("jac_u") * 1.0 / F.count(F.lit(1)) / 1000000, 6).alias(
                "avg_exact_jaccard"
            ),
        )
        .orderBy("est_bin")
    )
