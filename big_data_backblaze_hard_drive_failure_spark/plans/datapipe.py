"""LLM-training-data pipeline queries (SURVEY.md §2.14 / Phase E).

Operators a 100 TB text/embedding corpus pipeline needs, Spark-first:

  dedup        exact (sha256 fingerprint group-by), MinHash+LSH banding
               (candidate pairs only — NEVER all-pairs), SimHash,
               n-gram Jaccard
  similarity   brute-force cosine top-k (bounded query set, broadcast)
               + MinHashLSH/BucketedRandomProjectionLSH scale path
  text         stats, language-ID heuristic, BPE-ish token counting,
               positional fingerprints
  multimodal   opaque binary payloads + Arrow mapInPandas decode

Scale design notes are on each query. The common theme: per-token /
per-shingle work is map-side (no shuffle until the per-doc group-by),
signatures are O(docs) not O(tokens), and candidate generation always
goes through hash buckets so the pair join is bucket-local — the
all-pairs O(n^2) join never appears in any plan.

Cross-engine determinism: all hashing is md5/sha2 (identical hex in
DuckDB), all ratios are exact-integer divisions, and MinHash 'min' is
over hex-string ordering (bytewise-identical in both engines).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import DEFAULT_SALTS, minhash_expr, text_sha256
from ..functions.multimodal import (
    binary_payload,
    decode_audio_meta,
    decode_image_meta,
    decode_image_meta_tolerant,
    decode_resize_meta,
    decode_video_meta,
    fake_decode_meta,
    synth_audio_payloads,
    synth_image_payloads,
    synth_video_payloads,
    transcode_png_meta,
)
from ..functions.text import (
    BPE_ISH_PATTERN,
    avg_token_len,
    ngram_shingles,
    stopword_hits,
    token_count_regex,
    tokens,
    unique_tokens,
)
from ..functions.vector import as_double_array, cosine_similarity
from ..operators.topk import top_k_per_group
from ..sources.catalog import load
from . import query

STOPWORDS = ("the", "a")
_STOP_SQL = "['the', 'a']"


# ====================================================================
# Exact deduplication
# ====================================================================
@query(
    "datapipe_exact_dedup",
    oracle="""
    SELECT sha256(text) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY fingerprint
    """,
)
def datapipe_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint: one hash per doc (map-side)
    then a group-by shuffling only (hash, id) pairs — O(docs) shuffle
    bytes regardless of document size. ``keep_id = min(doc_id)`` is the
    deterministic survivor policy. At 100 TB this is THE cheap first
    pass before any near-dup work."""
    return (
        load(spark, sf_dir, "documents")
        .select(text_sha256("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "datapipe_incremental_dedup",
    oracle="""
    WITH batch AS (
        SELECT doc_id, source, sha256(text) AS fp,
               row_number() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id) AS rn
        FROM documents WHERE source = 'src0'
    )
    SELECT b.doc_id, b.source, b.fp
    FROM batch b
    WHERE b.rn = 1
      AND NOT EXISTS (
          SELECT 1 FROM documents h
          WHERE h.source <> 'src0' AND sha256(h.text) = b.fp
      )
    """,
)
def datapipe_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — THE production shape for a corpus
    that grows daily: dedupe the new batch internally (min-doc_id
    survivor via a rank-1 window) then LEFT ANTI join against the
    history's fingerprints, so only never-seen content lands. Shuffle
    is O(batch + history fingerprints), not O(corpus text); at 100 TB
    the history side is a bucketed fingerprint table and the anti
    join stays co-partitioned. Here 'src0' plays the new batch and
    the other sources play history."""
    docs = load(spark, sf_dir, "documents")
    batch = (
        docs.filter(F.col("source") == "src0")
        .select("doc_id", "source", text_sha256("text").alias("fp"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    history = docs.filter(F.col("source") != "src0").select(
        text_sha256("text").alias("fp")
    )
    return batch.join(history, "fp", "left_anti").select(
        "doc_id", "source", "fp"
    )


@query(
    "datapipe_exact_dedup_summary",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT sha256(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT sha256(text)) AS n_dupes
    FROM documents
    """,
)
def datapipe_exact_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "documents").select(
        text_sha256("text").alias("fp")
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dupes"),
    )


# ====================================================================
# MinHash signatures + LSH banding (near-dup candidates)
# ====================================================================
def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature: k salted-md5 'permutations', min
    over the doc's distinct-token set. Explode is per-token but the
    aggregation is map-side-combinable (min), so the shuffle carries
    one partial row per (doc, partition) — O(docs).

    ``fan_out_by``: when the whole table fits in one scan split (the
    bench fixtures — a single unsplittable parquet row group), the
    tokenize + 4×md5 work here would otherwise run in ONE scan task;
    the doc_id fan-out parallelizes it across the session width and
    the groupBy(doc_id) below reuses that partitioning (no extra
    exchange in the aggregate). No-op at production scale — see
    sources/catalog._fan_out_small_scan."""
    docs = load(spark, sf_dir, "documents", fan_out_by=("doc_id",)).select(
        "doc_id", F.explode(unique_tokens("text")).alias("tok")
    )
    aggs = [
        F.min(minhash_expr("tok", salt)).alias(f"mh{i}")
        for i, salt in enumerate(DEFAULT_SALTS)
    ]
    return docs.groupBy("doc_id").agg(*aggs)


_SIG_SQL = """
    SELECT doc_id,
           MIN(md5('s0|' || tok)) AS mh0,
           MIN(md5('s1|' || tok)) AS mh1,
           MIN(md5('s2|' || tok)) AS mh2,
           MIN(md5('s3|' || tok)) AS mh3
    FROM (
        SELECT doc_id,
               unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    )
    GROUP BY doc_id
"""


@query("datapipe_minhash_signatures", oracle=_SIG_SQL)
def datapipe_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir)


# LSH banding scheme (b=2 bands x r=2 signature rows) — ONE
# definition shared by every near-dup family member (buckets,
# clusters, pairs, components, editdist, incremental), with
# _BANDS_FROM_SIG_SQL as its oracle-side twin over a CTE named
# ``sig``: changing the scheme is a single edit on each side.
_BAND_STACK = (
    "stack(2, 0, concat(mh0, mh1), 1, concat(mh2, mh3)) "
    "AS (band_id, band_key)"
)
_BANDS_FROM_SIG_SQL = """
        SELECT 0 AS band_id, mh0 || mh1 AS band_key, doc_id FROM sig
        UNION ALL
        SELECT 1 AS band_id, mh2 || mh3 AS band_key, doc_id FROM sig
"""


def _bands(sig: DataFrame) -> DataFrame:
    """One row per (doc, band), keyed by the concatenated band hash —
    the candidate-generation unit for the whole near-dup family."""
    return sig.select("doc_id", F.expr(_BAND_STACK))


_BANDS_SQL = f"""
    WITH sig AS ({_SIG_SQL})
    SELECT band_id, band_key, COUNT(*) AS n_docs
    FROM ({_BANDS_FROM_SIG_SQL})
    GROUP BY band_id, band_key
    HAVING COUNT(*) >= 2
"""


@query("datapipe_lsh_buckets", oracle=_BANDS_SQL)
def datapipe_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding (b=2 bands x r=2 rows): docs sharing a band key are
    near-dup CANDIDATES. Bucket sizes, filtered to real buckets. The
    point at scale: candidate generation is a group-by on a short hash
    key — the O(n^2) pair space is never materialized; skewed buckets
    (boilerplate docs) are visible right here as outliers and AQE
    splits them in the downstream join."""
    bands = _bands(_signatures(spark, sf_dir))  # doc_id pruned below
    return (
        bands.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------------
# LSH banding, xxhash64 scale twin — the production hash for the same
# candidate generation. The round-9 A/B at sf1 (SCALE.md) decomposed
# datapipe_lsh_buckets' growth: ALL of it is the per-token md5 map
# (2.78s of the 2.99s at sf1; banding group-by is flat 1.3x with a
# 10x bigger max bucket), and md5 exists on both engines only for
# oracle parity. Swapping the permutation hash to Spark's JVM-native
# xxhash64 (any uniform 64-bit hash is a valid MinHash permutation)
# measured 0.92s for the same signatures — ~3x end-to-end — so this
# twin is what a 100 TB run should call. rows-only by design: DuckDB
# has no xxhash64, so there is no cross-engine oracle; determinism
# comes from the hash itself (seedless, content-only) and is covered
# by the rows-only rerun sweep.
# --------------------------------------------------------------------
@query("datapipe_lsh_buckets_xxhash64")
def datapipe_lsh_buckets_xxhash64(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(unique_tokens("text")).alias("tok")
    )
    sig = docs.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.concat(F.lit(f"s{i}|"), F.col("tok"))))
            .alias(f"mh{i}")
            for i in range(4)
        ]
    )
    bands = sig.select(
        "doc_id",
        F.expr(
            "stack(2, 0, concat(cast(mh0 as string), '|', "
            "cast(mh1 as string)), 1, concat(cast(mh2 as string), '|', "
            "cast(mh3 as string))) AS (band_id, band_key)"
        ),
    )
    return (
        bands.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


_PAIR_BUCKET_CAP = 16  # pairwise verify only inside small buckets


@query(
    "datapipe_neardup_clusters",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    bucket_min AS (
        SELECT band_id, band_key, MIN(doc_id) AS bucket_rep
        FROM bands GROUP BY band_id, band_key
    )
    SELECT b.doc_id, MIN(m.bucket_rep) AS rep_id
    FROM bands b
    JOIN bucket_min m
      ON m.band_id = b.band_id AND m.band_key = b.band_key
    GROUP BY b.doc_id
    """,
)
def datapipe_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup DEDUP at scale: assign every doc to a cluster
    representative (min doc_id over its LSH buckets; one pass of the
    standard iterate-to-fixpoint star contraction). This is the
    operator that actually dedupes a 100 TB corpus: everything is
    O(docs) — bucket mins via map-side-combinable aggregation, a join
    that emits exactly one row per (doc, band), and a final per-doc
    min. The quadratic pair space never exists; mega-clusters of
    boilerplate (which real corpora always have) cost the same as
    singletons. Survivors = docs with rep_id == doc_id."""
    bands = _bands(_signatures(spark, sf_dir))
    # bucket minima via WINDOW (not groupBy + join-back) so the
    # signature subtree is evaluated once: one exchange on the band
    # key, one on doc_id

    w = Window.partitionBy("band_id", "band_key")
    return (
        bands.withColumn("bucket_rep", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("rep_id"))
    )


@query(
    "datapipe_neardup_pairs",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    sized AS (
        SELECT band_id, band_key, doc_id,
               COUNT(*) OVER (PARTITION BY band_id, band_key) AS n_bucket
        FROM bands
    ),
    small AS (
        SELECT band_id, band_key, doc_id FROM sized
        WHERE n_bucket BETWEEN 2 AND {_PAIR_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM small a JOIN small b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    toks AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
        FROM documents
    )
    SELECT doc_a, doc_b,
           len(list_intersect(ta.ts, tb.ts)) * 1.0 /
           len(list_distinct(list_concat(ta.ts, tb.ts))) AS jaccard
    FROM cand
    JOIN toks ta ON ta.doc_id = doc_a
    JOIN toks tb ON tb.doc_id = doc_b
    WHERE len(list_intersect(ta.ts, tb.ts)) * 1.0 /
          len(list_distinct(list_concat(ta.ts, tb.ts))) >= 0.5
    """,
)
def datapipe_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates -> exact token-set Jaccard verification -> pairs
    above 0.5, with the pairwise stage gated to SMALL buckets
    (2..{cap} docs). Mega-buckets are near-certain duplicate clusters;
    they go through datapipe_neardup_clusters (O(docs)) instead of a
    quadratic pair join — the bucket-size gate is what keeps this
    plan's worst case bounded at any corpus size. Exact-integer
    Jaccard -> cross-engine reproducible."""
    bands = _bands(_signatures(spark, sf_dir))

    # Round-11 rewrite (supersedes this round's own shuffle_hash
    # hint, which fixed the static broadcast the hard way): the 2..cap
    # gate bounds bucket SIZE by construction, so each small bucket's
    # candidate pairs are a <= cap-element per-bucket ARRAY —
    # collect_set the doc_ids per (band_id, band_key), filter on
    # array size (replacing the bucket-count window and its sort),
    # and explode twice within the row. One band-keyed shuffle and
    # two map-side Generates replace window + self-join; there is no
    # join left for the static planner to mis-broadcast. (bands
    # emits one row per (doc, band), so set size == the old window
    # row count.)
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_set("doc_id").alias("ds"))
        .filter(F.size("ds").between(2, _PAIR_BUCKET_CAP))
    )
    cand = (
        buckets.select(F.explode("ds").alias("doc_a"), F.col("ds"))
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", unique_tokens("text").alias("ts")
    )
    ta, tb = toks.alias("ta"), toks.alias("tb")
    jac = (
        F.size(F.array_intersect(F.col("ta.ts"), F.col("tb.ts"))) * 1.0
        / F.nullif(
            F.size(F.array_union(F.col("ta.ts"), F.col("tb.ts"))), F.lit(0)
        )  # two empty token sets: similarity undefined, NULL like DuckDB
    )
    return (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(tb, F.col("tb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ====================================================================
# n-gram shingle Jaccard (order-sensitive near-dup, small pair set)
# ====================================================================
@query(
    "datapipe_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   for i in range(1, greatest(len(toks) - 1, 1))
               ]) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id < 12)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.shingles, b.shingles)) * 1.0 /
           len(list_distinct(list_concat(a.shingles, b.shingles)))
               AS jaccard3
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    """,
)
def datapipe_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard over a bounded doc set (pairwise compare is
    O(k^2) — only ever run it on a candidate set or a sample; the LSH
    path above is how candidates appear at scale)."""
    sh = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 12)
        .select(
            "doc_id",
            F.array_distinct(ngram_shingles("text", 3)).alias("shingles"),
        )
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
        * 1.0
        # two shingle-less docs (< 3 tokens): undefined, NULL on both
        # engines (ANSI division would abort the job on one such pair)
        / F.nullif(
            F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles"))),
            F.lit(0),
        )
    )
    return a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        jac.alias("jaccard3"),
    )


# ====================================================================
# SimHash (16-bit, md5-derived — cross-engine deterministic)
# ====================================================================
def _simhash_sql() -> str:
    digit = (
        "(instr('0123456789abcdef', substring(md5(tok), {pos}, 1)) - 1)"
    )
    bit_sums = []
    fp_terms = []
    for i in range(16):
        j, k = divmod(i, 4)
        d = digit.format(pos=j + 1)
        bit_sums.append(
            f"SUM(2 * (({d} // {2 ** k}) % 2) - 1) AS s{i}"
        )
        fp_terms.append(f"CASE WHEN s{i} > 0 THEN {2 ** i} ELSE 0 END")
    return f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ), sums AS (
        SELECT doc_id, {', '.join(bit_sums)}
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({' + '.join(fp_terms)} AS BIGINT) AS simhash16
    FROM sums
    """


@query("datapipe_simhash", oracle=_simhash_sql())
def datapipe_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-token md5-derived bit votes, summed per doc
    (map-side combinable), sign -> fingerprint. Near-dups then differ
    in few bits — candidate pairs come from grouping on the
    fingerprint (or rotated fingerprints for <=k-bit tolerance), never
    from pairwise comparison. Bit width is 16 here for a readable
    oracle; production uses 64 the same way."""
    from ..functions.hashing import simhash16_bit_sums

    tok = load(spark, sf_dir, "documents", fan_out_by=("doc_id",)).select(
        "doc_id", F.explode(unique_tokens("text")).alias("tok")
    )
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(c).alias(f"s{i}")
            for i, c in enumerate(simhash16_bit_sums("tok"))
        ]
    )
    fp = None
    for i in range(16):
        term = F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("long").alias("simhash16"))


# ====================================================================
# Similarity search over embeddings
# ====================================================================
@query(
    "datapipe_cosine_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL
    ), c AS (
        SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
        WHERE embedding IS NOT NULL
    ), sims AS (
        SELECT query_id, vec_id,
               list_dot_product(qe, ce) /
               (sqrt(list_dot_product(qe, qe)) *
                sqrt(list_dot_product(ce, ce))) AS cosine
        FROM q, c WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id, cosine, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(cosine, 6) DESC, vec_id) AS rank
        FROM sims WHERE cosine IS NOT NULL
    )
    WHERE rank <= 3
    """,
)
def datapipe_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the k-NN baseline. The bounded query
    set is BROADCAST against the corpus scan — one pass over the
    embeddings, no shuffle of the corpus; top-k per query uses the
    rank-pushdown window (WindowGroupLimit). Ranking on ROUND(cos, 6)
    with a vec_id tie-break keeps ranks stable across engines (raw
    doubles are bit-identical here, but rounding makes the contract
    explicit). NULL vectors and zero-norm pairs (NULL cosine) are not
    neighbors — excluded rather than left to engine null-ordering.
    Scale path for corpus-x-corpus: datapipe_knn_lsh."""
    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = (
        emb.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("qe"),
        )
    )
    c = emb.select("vec_id", as_double_array("embedding").alias("ce"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity("qe", "ce").alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return top_k_per_group(
        sims,
        ["query_id"],
        [F.round("cosine", 6).desc(), F.col("vec_id")],
        k=3,
    )


@query(
    "datapipe_cosine_neardup",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               embedding::DOUBLE[] AS v,
               32 * (embedding[1] > 0)::INT + 16 * (embedding[2] > 0)::INT
               + 8 * (embedding[3] > 0)::INT + 4 * (embedding[4] > 0)::INT
               + 2 * (embedding[5] > 0)::INT + (embedding[6] > 0)::INT
                   AS bucket
        FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) *
            sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM e a JOIN e b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) *
           sqrt(list_dot_product(b.v, b.v))) >= 0.3
    """,
)
def datapipe_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, LSH-bucketed: sign pattern
    of the first 6 dimensions is an axis-aligned random-hyperplane
    bucket (orthant LSH), the pair join is bucket-local, and only
    candidates get the exact cosine verify. Corpus of N -> ~N/64 per
    bucket -> the join is O(N^2/64) worst case instead of O(N^2), and
    sharper at higher bit widths; recall tunes with the bit count /
    multiple rotated bucketings, exactly like MinHash banding. No
    all-pairs join at any scale."""
    sign_bits = None
    for d in range(6):
        bit = (F.element_at(F.col("embedding"), d + 1) > 0).cast("int")
        term = bit * (2 ** (5 - d))
        sign_bits = term if sign_bits is None else sign_bits + term
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())  # no bucket, no pairs
        .select(
            "vec_id",
            as_double_array("embedding").alias("v"),
            sign_bits.alias("bucket"),
        )
    )
    # Round 14 (§2.4): BOTH self-join sides read the same projected
    # frame — unstaged, the embeddings corpus was scanned (and the
    # float->double conversion computed) twice per run. Staging it is
    # an O(corpus) persist: vec_id + 64-double vector + bucket, i.e.
    # roughly the scan's own width — the memory trade the round-13
    # verdict asked to A/B (MEMORY_AND_DISK spills rather than
    # recomputes on pressure).
    from ..operators.staging import ab_off, stage_boundary

    if not ab_off("cosine_neardup_stage"):
        e = stage_boundary(e, materialize=False)
    a, b = e.alias("a"), e.alias("b")
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


@query(
    "datapipe_embedding_quantize",
    oracle="""
    WITH dims AS (
        SELECT d.d AS dim, max(abs(CAST(e.embedding[d.d] AS DOUBLE))) AS s
        FROM embeddings e, (SELECT unnest(range(1, 65)) AS d) d
        GROUP BY 1
    ), sc AS (
        SELECT list(CASE WHEN s = 0 THEN 1 ELSE s END ORDER BY dim)
                   AS scales
        FROM dims
    )
    SELECT e.vec_id,
           array_to_string(
               list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(CAST(floor(CAST(127 AS DOUBLE)
                                   * CAST(e.embedding[i] AS DOUBLE)
                                   / sc.scales[i]
                                   + CAST(0.5 AS DOUBLE)) AS INTEGER)
                             AS VARCHAR)),
               ',') AS codes_csv
    FROM embeddings e, sc
    """,
)
def datapipe_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization — the standard 4x embedding
    compression before ANN at scale. Per-dim max-abs scales come from
    one posexplode + 64-group agg (map-side combinable, 64-row
    result), broadcast back as a 1-row array; codes are a pure
    zip_with map. Rounding is floor(x + 0.5) — identical IEEE double
    ops in both engines, so the oracle is bit-exact (Spark ROUND and
    DuckDB ROUND disagree on half-way rationals; floor does not).
    Scale: one shuffle of 64 partial maxima, then map-only."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    scales = (
        emb.select(F.posexplode("v").alias("dim", "val"))
        .groupBy("dim")
        .agg(F.max(F.abs(F.col("val"))).alias("s"))
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("ds"))
        .select(
            F.expr("transform(ds, x -> IF(x.s = 0D, 1D, x.s))").alias("scales")
        )
    )
    return emb.crossJoin(F.broadcast(scales)).select(
        "vec_id",
        # CSV-encode the int8 codes: the correctness harness compares
        # scalar columns only (top-level arrays are unorderable in its
        # pandas canonicalizer), and the join keeps the full code
        # vector checkable byte-for-byte.
        F.expr(
            "array_join(transform(zip_with(v, scales, (x, s) ->"
            " CAST(floor(127D * x / s + 0.5D) AS INT)),"
            " c -> CAST(c AS STRING)), ',')"
        ).alias("codes_csv"),
    )


_SIGN_SIG_SQL = (
    "CAST(list_sum(list_transform(range(0, 32), i -> CASE WHEN "
    "embedding[i + {off}] > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END)) "
    "AS BIGINT)"
)


@query(
    "datapipe_hamming_neardup",
    oracle=f"""
    WITH sigs AS (
        SELECT vec_id,
               {_SIGN_SIG_SQL.format(off=1)} AS sig_lo,
               {_SIGN_SIG_SQL.format(off=33)} AS sig_hi
        FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(bit_count(xor(a.sig_lo, b.sig_lo))
                + bit_count(xor(a.sig_hi, b.sig_hi)) AS INTEGER)
               AS hamming
    FROM sigs a JOIN sigs b
      ON (a.sig_lo & 255) = (b.sig_lo & 255) AND a.vec_id < b.vec_id
    """,
)
def datapipe_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit Hamming candidate generation — binarize each embedding
    to 64 sign bits (each bit IS a random-hyperplane LSH hash of the
    vector), band on the low 8 bits, and compute exact Hamming
    distance only inside buckets. The pair space is never
    materialized: candidates are the ~N^2/256 band collisions, not
    N^2 (widen the band for bigger corpora — each extra band bit
    halves candidates). Signature build is a pure JVM map; the only
    shuffle is the band-key join."""
    # NULL vectors have no signature (a NULL sig would silently drop
    # via the null join key anyway; DuckDB's CASE would instead fold
    # them to sig 0 — filter on both engines so neither happens)
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", as_double_array("embedding").alias("v"))
    )

    def sig(offset: int) -> Column:
        return F.expr(
            f"aggregate(zip_with(slice(v, {offset}, 32), sequence(0, 31),"
            " (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)),"
            " 0L, (a, b) -> a + b)"
        )

    sigs = emb.select(
        "vec_id", sig(1).alias("sig_lo"), sig(33).alias("sig_hi")
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.expr("a.sig_lo & 255") == F.expr("b.sig_lo & 255"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                F.expr("bit_count(a.sig_lo ^ b.sig_lo)")
                + F.expr("bit_count(a.sig_hi ^ b.sig_hi)")
            ).cast("int").alias("hamming"),
        )
    )


# Memoized BRP-LSH fit, same rationale as _IVF_CENTROIDS below: the
# fit (random hyperplane draw) is seeded and input-independent in
# everything but the vector dimension, yet costs a full MLlib fit job
# per call — the #1 absolute cost in the round-4 bench. The model is a
# JVM object tied to a SparkSession, so the memo key includes the
# applicationId: a new session refits instead of dereferencing a dead
# JVM handle.
_BRP_LSH_MODELS: dict[tuple[str, str], object] = {}


def _brp_lsh_fit(spark: SparkSession, sf_dir: str, emb: DataFrame):
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    app_id = spark.sparkContext.applicationId
    key = (app_id, os.path.realpath(sf_dir))
    if key not in _BRP_LSH_MODELS:
        # evict entries from other (stopped) sessions: their JVM
        # handles are dead and would otherwise accumulate unbounded
        # across session restarts in one long-lived process
        for stale in [k for k in _BRP_LSH_MODELS if k[0] != app_id]:
            del _BRP_LSH_MODELS[stale]
        lsh = BucketedRandomProjectionLSH(
            inputCol="v", outputCol="h", bucketLength=2.0,
            numHashTables=3, seed=42,
        )
        # MLlib's fit needs >= 1 row to size the hyperplanes; a
        # zero-row corpus memoizes None and the caller returns the
        # empty result (the isEmpty probe runs once per session+dir,
        # inside the memo, so the bench path never re-pays it)
        _BRP_LSH_MODELS[key] = None if emb.isEmpty() else lsh.fit(emb)
    return _BRP_LSH_MODELS[key]


@query("datapipe_knn_lsh")
def datapipe_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for similarity search: random-hyperplane LSH
    (MLlib BucketedRandomProjectionLSH) — hash the corpus once (fit
    memoized per session+dir), join query hashes to bucket-colliding
    candidates only. Seeded but not SQL-expressible -> driver's
    rows-only check. Returns candidate counts per query within
    distance 9.0 (euclidean on unit-ish vectors ~ cosine band)."""
    from pyspark.ml.functions import array_to_vector

    emb = (
        load(spark, sf_dir, "embeddings")
        # a NULL vector can't be hashed or matched — not part of the
        # index by definition; filter BEFORE array_to_vector, whose
        # JVM lambda NPEs on a null array rather than passing it
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            array_to_vector(as_double_array("embedding")).alias("v"),
        )
    )
    model = _brp_lsh_fit(spark, sf_dir, emb)
    if model is None:  # zero-row corpus: no neighbors to find
        return spark.createDataFrame(
            [], "query_id BIGINT, n_candidates BIGINT"
        )
    q = emb.filter(F.col("vec_id") < 5)
    joined = model.approxSimilarityJoin(q, emb, 9.0, distCol="dist")
    return (
        joined.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .groupBy(F.col("datasetA.vec_id").alias("query_id"))
        .agg(F.count(F.lit(1)).alias("n_candidates"))
        .orderBy("query_id")
    )


# ====================================================================
# Text analysis
# ====================================================================
@query(
    "datapipe_text_stats",
    oracle=f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           length(text) AS n_chars,
           list_sum(list_transform(toks, t -> length(t))) * 1.0
               / len(toks) AS avg_token_len,
           len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
           len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) * 1.0
               / len(toks) AS stop_ratio
    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
          FROM documents)
    """,
)
def datapipe_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality stats: token/char counts, type-token ratio,
    stopword ratio — the standard quality-scoring features. All array
    expressions over one scan (no explode, no shuffle at all: this is
    a pure map job at any scale). Ratios are exact-integer divisions."""
    t = tokens("text")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(unique_tokens("text")).alias("n_unique"),
        F.length("text").alias("n_chars"),
        avg_token_len("text").alias("avg_token_len"),
        (F.size(unique_tokens("text")) * 1.0 / F.size(t)).alias("ttr"),
        (stopword_hits("text", STOPWORDS) * 1.0 / F.size(t)).alias(
            "stop_ratio"
        ),
    )


@query(
    "datapipe_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CASE WHEN len(list_filter(string_split(text, ' '),
                             t -> list_contains({_STOP_SQL}, t))) * 1.0
                         / len(string_split(text, ' ')) >= 0.03
                    THEN 'en' ELSE 'und' END AS predicted_lang
        FROM documents
    )
    SELECT predicted_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM scored GROUP BY predicted_lang
    """,
)
def datapipe_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID (the classic n-gram/func-word
    heuristic): English function-word density >= 3% -> 'en'. Pure
    map + tiny aggregate; accuracy is auditable against the fixture's
    lang column."""
    ratio = stopword_hits("text", STOPWORDS) * 1.0 / F.size(tokens("text"))
    pred = F.when(ratio >= 0.03, "en").otherwise("und")
    return (
        load(spark, sf_dir, "documents")
        .select("lang", pred.alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("predicted_lang") == F.col("lang"), 1).otherwise(0)
            ).alias("n_correct"),
        )
    )


@query(
    "datapipe_token_count_regex",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')))
                AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
)
def datapipe_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budgeting with a BPE-ish regex pre-tokenizer,
    rolled up by source — the 'how many training tokens do we have,
    and from where' query. Regex runs map-side; the group-by shuffles
    one partial row per source per task."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_regex("text")).alias("total_tokens"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )


@query(
    "datapipe_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(list_sum([
               i * (length(toks[i]) * 31 + ascii(substring(toks[i], 1, 1)))
               for i in range(1, len(toks) + 1)
           ]) % 1000000007 AS BIGINT) AS fingerprint
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def datapipe_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling fingerprint: order-sensitive (unlike
    the token-set hashes above), so reordered near-dups hash apart.
    Exact integer arithmetic end-to-end; pure map job."""
    expr = (
        "aggregate("
        "  transform(split(text, ' '), (t, i) ->"
        "    CAST((i + 1) * (length(t) * 31 + ascii(substring(t, 1, 1)))"
        "         AS BIGINT)),"
        "  CAST(0 AS BIGINT), (acc, x) -> acc + x"
        ") % 1000000007"
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(expr).alias("fingerprint")
    )


# ====================================================================
# Multimodal columns
# ====================================================================
@query(
    "datapipe_props_json",
    # json_valid + TRY_CAST mirror from_json's PERMISSIVE behavior:
    # malformed JSON, a non-object, a nested value, a case-mismatched
    # key, or an int32 overflow all extract as NULL instead of
    # erroring (DuckDB's json_extract throws on malformed input)
    oracle="""
    WITH k AS (
        SELECT CASE WHEN props IS NOT NULL AND json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.k')
                                  AS INTEGER)
               END AS k
        FROM events
    )
    SELECT k % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           MIN(k) AS k_min,
           MAX(k) AS k_max
    FROM k GROUP BY k_bucket
    """,
)
def datapipe_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction from a JSON string column
    (``from_json`` with an explicit schema — never schema_of_json at
    scale) + bucketed rollup. The parse is codegen'd JVM work."""
    k = F.from_json("props", "k INT").getField("k")
    return (
        load(spark, sf_dir, "events")
        .select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "datapipe_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           -- the decoder reads payload BYTES: ascii() would return
           -- the first CODE POINT (220 for 'Ü' instead of byte 0xC3)
           CASE WHEN text IS NULL THEN NULL
                WHEN octet_length(encode(text)) = 0 THEN -1
                ELSE CAST(CONCAT('0x',
                          substring(hex(encode(text)), 1, 2)) AS INTEGER)
           END AS first_byte,
           CAST(64 + octet_length(encode(text)) % 512 AS INTEGER)
               AS fake_width,
           CAST(64 + octet_length(encode(text)) % 384 AS INTEGER)
               AS fake_height,
           CAST(1 + octet_length(encode(text)) % 7 AS INTEGER)
               AS fake_n_frames
    FROM documents
    """,
)
def datapipe_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary decode plumbing: binary payload column ->
    Arrow-batched mapInPandas 'decoder' -> typed metadata struct.
    The decoder here is the deterministic codec-free twin; the REAL
    container decode is datapipe_multimodal_decode below."""
    df = load(spark, sf_dir, "documents").select(
        "doc_id", binary_payload("text").alias("payload")
    )
    return fake_decode_meta(df)


@query(
    "datapipe_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 8 AS INTEGER) AS width,
           CAST(3 + doc_id % 5 AS INTEGER) AS height,
           CAST((4 + doc_id % 8) * (3 + doc_id % 5) AS BIGINT) AS n_pixels,
           CAST(list_sum(list_transform(
                    range(0, (4 + doc_id % 8) * (3 + doc_id % 5) * 3),
                    i -> (doc_id * 31 + i) % 256)) AS BIGINT)
               AS pixel_byte_sum,
           CAST(doc_id * 31 % 256 AS INTEGER) AS top_left_r,
           CAST((doc_id * 31
                 + (4 + doc_id % 8) * (3 + doc_id % 5) * 3 - 1) % 256
                AS INTEGER) AS bottom_right_b
    FROM documents
    """,
)
def datapipe_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize genuine BMP/PPM
    container bytes per doc into a binary column (Arrow mapInPandas),
    then parse them back with the pure-Python decoder
    (functions/multimodal.py:decode_image) — header fields, bottom-up
    row order, 4-byte padding and all. The oracle recomputes every
    decoded stat closed-form from the generator's byte rule, so any
    layout mistake in EITHER codec direction breaks the hash match.
    Scale shape: two chained Arrow map stages over one scan — no
    shuffle, no driver-side blobs; at 100 TB this is exactly the
    decode-and-extract pass of a multimodal ingest pipeline with the
    synthesizer swapped for a real blob column."""
    df = load(spark, sf_dir, "documents").select("doc_id")
    return decode_image_meta(synth_image_payloads(df))


@query(
    "datapipe_multimodal_decode_tolerant",
    oracle="""
    SELECT doc_id,
           doc_id % 7 <> 0 AS ok,
           CASE WHEN doc_id % 7 <> 0
                THEN CAST(4 + doc_id % 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 7 <> 0
                THEN CAST(3 + doc_id % 5 AS INTEGER) END AS height,
           CASE WHEN doc_id % 7 <> 0
                THEN CAST(list_sum(list_transform(
                         range(0, (4 + doc_id % 8) * (3 + doc_id % 5) * 3),
                         i -> (doc_id * 31 + i) % 256)) AS BIGINT)
           END AS pixel_byte_sum
    FROM documents
    """,
)
def datapipe_multimodal_decode_tolerant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corruption-tolerant decode: every 7th payload is truncated to
    10 bytes (JVM-side substring on the binary column — deterministic
    stand-in for real-world corrupt blobs), and the tolerant decoder
    flags those rows (ok=false, stats null) instead of failing the
    batch. The oracle recomputes both branches closed-form. At 100 TB
    this is the difference between a decode pass that finishes with
    an audit trail and one that dies on the first bad blob."""
    df = load(spark, sf_dir, "documents").select("doc_id")
    payloads = synth_image_payloads(df).withColumn(
        "payload",
        F.expr(
            "CASE WHEN doc_id % 7 = 0 THEN substring(payload, 1, 10) "
            "ELSE payload END"
        ),
    )
    return decode_image_meta_tolerant(payloads)


@query(
    "datapipe_image_resize",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(flatten(list_transform(range(0, 2), y ->
                flatten(list_transform(range(0, 2), x ->
                    list_transform(range(0, 3), c ->
                        (doc_id * 31
                         + (((y * (3 + doc_id % 5)) // 2)
                              * (4 + doc_id % 8)
                            + (x * (4 + doc_id % 8)) // 2) * 3
                         + c) % 256
                    )))))) AS BIGINT) AS rs_byte_sum,
           CAST(doc_id * 31 % 256 AS INTEGER) AS rs_top_left_r,
           CAST((doc_id * 31
                 + ((((3 + doc_id % 5) // 2) * (4 + doc_id % 8)
                     + (4 + doc_id % 8) // 2) * 3 + 2)) % 256
                AS INTEGER) AS rs_bottom_right_b
    FROM documents
    """,
)
def datapipe_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize to 2x2 in one Arrow map stage —
    the preprocess step of an image training pipeline (decode, resize,
    featurize) with the resize floor-mapping recomputed closed-form by
    the oracle. Same no-shuffle scale shape as the decode query."""
    df = load(spark, sf_dir, "documents").select("doc_id")
    return decode_resize_meta(synth_image_payloads(df))


@query(
    "datapipe_video_frame_decode",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 6 AS INTEGER) AS n_frames,
           CAST(3 + doc_id % 4 AS INTEGER) AS width,
           CAST(2 AS INTEGER) AS height,
           '0,' || CAST(1 + doc_id % 6 AS VARCHAR) AS sampled_frame_ids_csv,
           CAST(list_sum(list_transform(range(0, (3 + doc_id % 4) * 6),
                    i -> (doc_id * 13 + i) % 256))
                + list_sum(list_transform(range(0, (3 + doc_id % 4) * 6),
                    i -> (doc_id * 13 + (1 + doc_id % 6) * 7 + i) % 256))
               AS BIGINT) AS sampled_byte_sum
    FROM documents
    """,
)
def datapipe_video_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling: parse a concatenated-PPM frame
    stream (the ffmpeg image2pipe convention) per doc, pick 2
    evenly-spaced frames with the same index rule as the index-only
    twin datapipe_frame_sample, and decode the sampled frames' pixels
    — all in one Arrow map stage. Oracle recomputes frame count,
    dims, sampled indices, and sampled pixel sums closed-form from
    the generator rule; any frame-boundary or header-scan mistake in
    the stream parser breaks the hash."""
    df = load(spark, sf_dir, "documents").select("doc_id")
    out = decode_video_meta(synth_video_payloads(df), k_frames=2)
    # CSV-encode the sampled indices: the harness compares scalar
    # columns only (top-level arrays are unorderable in its pandas
    # canonicalizer); the join string pins the exact pick set.
    return out.select(
        "doc_id",
        "n_frames",
        "width",
        "height",
        F.array_join(
            F.transform("sampled_frame_ids", lambda c: c.cast("string")),
            ",",
        ).alias("sampled_frame_ids_csv"),
        "sampled_byte_sum",
    )


@query(
    "datapipe_multimodal_curation",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(4 + doc_id % 8 AS INTEGER) AS width,
           CAST(3 + doc_id % 5 AS INTEGER) AS height,
           CAST(list_sum(list_transform(
                    range(0, (4 + doc_id % 8) * (3 + doc_id % 5) * 3),
                    i -> (doc_id * 31 + i) % 256))
                // ((4 + doc_id % 8) * (3 + doc_id % 5) * 3)
               AS BIGINT) AS mean_pixel
    FROM documents
    WHERE len(string_split(text, ' ')) >= 5
      AND (4 + doc_id % 8) * (3 + doc_id % 5) >= 24
      AND list_sum(list_transform(
              range(0, (4 + doc_id % 8) * (3 + doc_id % 5) * 3),
              i -> (doc_id * 31 + i) % 256))
          // ((4 + doc_id % 8) * (3 + doc_id % 5) * 3) BETWEEN 64 AND 192
    """,
)
def datapipe_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation capstone: join per-doc TEXT quality
    (JVM-side token count) with REAL decoded IMAGE stats (the Arrow
    decode stage) and keep docs passing both modality gates — minimum
    caption length, minimum resolution, mid-range mean brightness
    (integer division keeps it exact). Shape at 100 TB: the image
    branch is map-only over the same scan, the join is a same-key
    hash join on doc_id, filters push into both branches. This is the
    image-text pair filtering step of a multimodal pretraining
    pipeline (CLIP/LAION-style) with the synthesizer standing in for
    the blob column."""
    t = tokens("text")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(t).alias("n_tokens")
    )
    imgs = decode_image_meta(synth_image_payloads(docs.select("doc_id")))
    return (
        docs.join(imgs, "doc_id")
        .withColumn(
            "mean_pixel", F.expr("pixel_byte_sum div (n_pixels * 3)")
        )
        .filter(
            (F.col("n_tokens") >= 5)
            & (F.col("n_pixels") >= 24)
            & F.col("mean_pixel").between(64, 192)
        )
        .select("doc_id", "n_tokens", "width", "height", "mean_pixel")
    )


@query(
    "datapipe_audio_decode",
    oracle="""
    SELECT doc_id,
           CAST(8000 + 1000 * (doc_id % 3) AS INTEGER) AS sample_rate,
           CAST(20 + doc_id % 13 AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(range(0, 20 + doc_id % 13),
                i -> abs(((doc_id * 37 + i * 11) % 4001) - 2000)))
               AS BIGINT) AS amp_sum,
           CAST(list_aggregate(list_transform(range(0, 20 + doc_id % 13),
                i -> abs(((doc_id * 37 + i * 11) % 4001) - 2000)), 'max')
               AS INTEGER) AS amp_max,
           CAST(((doc_id * 37) % 4001) - 2000 AS INTEGER) AS first_sample,
           CAST(((doc_id * 37 + (19 + doc_id % 13) * 11) % 4001) - 2000
                AS INTEGER) AS last_sample
    FROM documents
    """,
)
def datapipe_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: synthesize genuine RIFF/WAVE
    PCM16 payloads into a binary column, parse them back with the
    pure-Python chunk walker (functions/multimodal.py:decode_audio),
    emit rate + amplitude stats. Oracle recomputes every stat from
    the generator's closed-form sample rule — a chunk-offset or
    endianness mistake breaks the hash. Same Arrow map-only scale
    shape as the image decode."""
    df = load(spark, sf_dir, "documents").select("doc_id")
    return decode_audio_meta(synth_audio_payloads(df))


# --------------------------------------------------------------------
# String scalar batch (§2.9 extended surface): the portable string
# functions an LLM text pipeline leans on, one map-only pass.
# --------------------------------------------------------------------
@query(
    "datapipe_string_funcs",
    oracle="""
    SELECT doc_id,
           upper(source) AS src_upper,
           substring(source, 4, 2) AS src_num,
           lpad(source, 8, '_') AS src_pad,
           reverse(source) AS src_rev,
           replace(source, 'src', 'corpus') AS src_renamed,
           -- || not concat(): DuckDB's concat() SKIPS NULL args while
           -- Spark's concat propagates NULL; || propagates on both
           lang || ':' || source AS lang_src,
           levenshtein(source, 'src0') AS lev_to_src0,
           instr(text, 'spark') AS first_spark,
           trim(substring(text, 1, 10)) AS head10,
           repeat(lang, 2) AS lang2
    FROM documents
    """,
)
def datapipe_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.substring("source", 4, 2).alias("src_num"),
        F.lpad("source", 8, "_").alias("src_pad"),
        F.reverse(F.col("source")).alias("src_rev"),
        F.replace(F.col("source"), F.lit("src"), F.lit("corpus")).alias(
            "src_renamed"
        ),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias(
            "lang_src"
        ),
        F.levenshtein(F.col("source"), F.lit("src0")).alias("lev_to_src0"),
        F.instr(F.col("text"), "spark").alias("first_spark"),
        F.trim(F.substring("text", 1, 10)).alias("head10"),
        F.repeat(F.col("lang"), 2).alias("lang2"),
    )


# --------------------------------------------------------------------
# Python UDTF (§2.11 UDTF row): document chunking — one doc in, N
# 50-token chunks out via a LATERAL table function. The generative
# per-row logic lives in functions/udtfs.py; the oracle reproduces it
# with a range-unnest + list slice. Chunking is a map-side expansion:
# no shuffle, output rows ~ tokens/50 per doc.
# --------------------------------------------------------------------
@query(
    "datapipe_chunk_udtf",
    oracle="""
    SELECT doc_id,
           CAST((i - 1) // 50 AS INT) AS chunk_idx,
           array_to_string(toks[i:i+49], ' ') AS chunk_text,
           CAST(len(toks[i:i+49]) AS INT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         unnest(range(1, len(toks) + 1, 50)) AS u(i)
    """,
)
def datapipe_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udtfs import ChunkDocuments

    spark.udtf.register("chunk_documents", ChunkDocuments)
    # fan out the single-split scan so the per-row Python UDTF runs on
    # every core's worker, not the one scan task (no-op at scale)
    load(
        spark, sf_dir, "documents", fan_out_by=("doc_id",)
    ).createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT c.* FROM documents, "
        "LATERAL chunk_documents(doc_id, text) AS c"
    )


# --------------------------------------------------------------------
# Iterative connected components (label propagation to fixpoint) over
# the doc—band bipartite graph. datapipe_neardup_clusters is ONE round
# of this (cheap, but chains A~B~C via different bands can land in
# different clusters); this converges: every doc gets the min doc_id
# of its whole component.
#
# Scale design: each round is two shuffles (doc->band min, band->doc
# min) on O(docs) rows; lineage is cut per round (localCheckpoint) so
# the plan doesn't grow with iterations — the standard Spark pattern
# for iterative algorithms. Rounds needed = graph diameter in bands
# (tiny for dedup graphs).
#
# The fixpoint is DETERMINISTIC (min doc_id of each component), so it
# IS oracle-checkable despite being iterative: the oracle UNROLLS the
# exact same bounded update rule — _CC_ROUNDS rounds of
# (bucket min-label, then doc min-over-buckets) — as 2K linear
# group-by CTE stages. Extra rounds after convergence are no-ops
# (min-propagation is monotone), and if the diameter exceeds the
# bound, BOTH engines stop at the same partial labels: parity by
# construction, never a quadratic transitive closure. pytest
# additionally verifies the fixpoint against union-find ground truth.
# --------------------------------------------------------------------
_CC_ROUNDS = 10


def _cc_oracle(rounds: int) -> str:
    stages = []
    for r in range(1, rounds + 1):
        stages.append(
            f"bm{r} AS (SELECT b.band_id, b.band_key,"
            f" MIN(l.label) AS bl FROM bands b"
            f" JOIN labels{r - 1} l USING (doc_id)"
            f" GROUP BY b.band_id, b.band_key)"
        )
        stages.append(
            f"labels{r} AS (SELECT b.doc_id, MIN(m.bl) AS label"
            f" FROM bands b JOIN bm{r} m"
            f" ON b.band_id = m.band_id AND b.band_key = m.band_key"
            f" GROUP BY b.doc_id)"
        )
    return f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    labels0 AS (SELECT DISTINCT doc_id, doc_id AS label FROM bands),
    {', '.join(stages)}
    SELECT doc_id, CAST(label AS BIGINT) AS component_id
    FROM labels{rounds}
    """


@query("datapipe_neardup_components", oracle=_cc_oracle(_CC_ROUNDS))
def datapipe_neardup_components(
    spark: SparkSession, sf_dir: str, max_iter: int = _CC_ROUNDS
) -> DataFrame:
    from ..operators.staging import ab_off, lineage_cut

    edges = _bands(_signatures(spark, sf_dir)).select(
        F.concat_ws("#", F.col("band_id").cast("string"), "band_key").alias(
            "band"
        ),
        "doc_id",
    )
    edges = lineage_cut(edges)

    if not ab_off("cc_fused"):
        return _cc_fused_rounds(edges, max_iter)

    labels = edges.groupBy("doc_id").agg(
        F.min("doc_id").alias("label")
    )  # init: own id
    # Convergence probe (round-13): min-propagation is MONOTONE — a
    # doc's label can only DECREASE round over round (each doc sits in
    # every band it contributes to, so the new min-over-bands is <= its
    # own old label). Hence the label SUM strictly decreases until the
    # fixpoint and is stationary exactly there, so "sum unchanged" ==
    # "no label changed". The old probe was a full O(docs) shuffle
    # JOIN of old vs new labels per round (plus a count job over it);
    # this is one map-side aggregate over the freshly-checkpointed
    # frame — no join, no shuffle beyond the 1-row combine (guide
    # §2.4). decimal(38,0) keeps the sum exact far beyond any real
    # corpus (1e10 docs x 1e10 max id = 1e20 << 1e38); doubles would
    # lose the strictness that makes the probe sound. The returned
    # fixpoint is unchanged vs the join probe (the only round-count
    # difference is one extra no-op round when the graph converges at
    # round 1, since the initial sum isn't probed — and extra rounds
    # after convergence are no-ops by monotonicity, matching the
    # oracle's fixed unroll).
    prev_sum = None
    for _ in range(max_iter):
        band_min = (
            edges.join(labels, "doc_id")
            .groupBy("band")
            .agg(F.min("label").alias("band_label"))
        )
        new_labels = (
            edges.join(band_min, "band")
            .groupBy("doc_id")
            .agg(F.min("band_label").alias("label"))
        )
        new_labels = lineage_cut(new_labels)
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("doc_id", F.col("label").alias("component_id"))


def _cc_fused_rounds(edges, max_iter: int):
    """Round-14 fused label-propagation loop (guide §2.4): the state is
    the EDGE frame carrying each doc's current label on every (band,
    doc) row, so a round is one band-keyed aggregate, one
    co-partitioned join back (the band exchange of the state serves
    BOTH — same-key exchange reuse), and one doc-partitioned window
    min — eliminating the old per-round edges⋈labels shuffle join
    entirely (2 joins + 3 exchanges -> 1 join + 2 exchanges per
    round). The UPDATE RULE is identical: new_label(d) = min over
    bands b∋d of min over d'∈b of label(d') — the window min over the
    doc's edge rows is the same min the old groupBy(doc_id) computed,
    and duplicate (band, doc) rows cannot change a min. The
    convergence probe transfers: per-edge labels are each
    non-increasing (the doc sits in every band it contributes to), so
    sum(label) over edge rows = sum over docs of label*degree with
    degree constant — strictly decreasing until the fixpoint and
    stationary exactly there; decimal(38,0) keeps it exact (1e10 docs
    x 1e10 ids x band count ~ 1e21 << 1e38). Same fixpoint, same
    break round as the per-doc probe. Per-round state checkpointed as
    O(edges) rather than O(docs) rows — the narrow 3-column frame is
    the price of the saved join."""
    from pyspark.sql import Window

    from ..operators.staging import lineage_cut

    el = edges.select("band", "doc_id", F.col("doc_id").alias("label"))
    doc_w = Window.partitionBy("doc_id")
    prev_sum = None
    for _ in range(max_iter):
        band_min = el.groupBy("band").agg(
            F.min("label").alias("band_label")
        )
        el = (
            el.join(band_min, "band")
            .withColumn("new_label", F.min("band_label").over(doc_w))
            .select("band", "doc_id", F.col("new_label").alias("label"))
        )
        el = lineage_cut(el)
        cur_sum = el.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return el.groupBy("doc_id").agg(
        F.min("label").alias("component_id")
    )


# --------------------------------------------------------------------
# Corpus-curation capstone: the composed LLM-data filter a training
# run actually executes — quality gates (length / stopword-density /
# type-token-ratio bounds) -> exact dedup of survivors -> per-source
# yield report. One scan + one O(docs) group-by; every stage before
# the group-by is map-side.
# --------------------------------------------------------------------
@query(
    "datapipe_corpus_curation",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, text,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                               t -> list_contains({_STOP_SQL}, t))) * 1.0
                   / len(string_split(text, ' ')) AS stop_ratio,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS ttr
        FROM documents
    ),
    kept AS (
        SELECT *, sha256(text) AS fp FROM scored
        WHERE n_tokens BETWEEN 20 AND 200
          AND stop_ratio <= 0.25 AND ttr >= 0.2
    ),
    deduped AS (
        SELECT fp, MIN(doc_id) AS keep_id,
               MIN(source) AS source,
               MIN(n_tokens) AS n_tokens
        FROM kept GROUP BY fp
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
    FROM deduped GROUP BY source
    """,
)
def datapipe_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tokens("text")
    scored = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.size(t).alias("n_tokens"),
        (stopword_hits("text", STOPWORDS) * 1.0 / F.size(t)).alias(
            "stop_ratio"
        ),
        (F.size(unique_tokens("text")) * 1.0 / F.size(t)).alias("ttr"),
    )
    kept = scored.filter(
        F.col("n_tokens").between(20, 200)
        & (F.col("stop_ratio") <= 0.25)
        & (F.col("ttr") >= 0.2)
    ).withColumn("fp", text_sha256("text"))
    deduped = kept.groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


# --------------------------------------------------------------------
# TF-IDF top terms per doc: tf (per-doc token counts) x idf
# (ln(N/df)) -> rank-pushdown top-3. All counts are exact integers;
# the only float is ln(N/df), computed identically per engine and
# rounded to 6dp for rank stability. Plan: one explode + two O(terms)
# aggregations + a broadcast join of the tiny term-df dimension —
# never a shuffle of the corpus itself. (MLlib HashingTF/IDF is the
# fixed-width-vector variant of the same computation; this keeps
# terms readable.)
# --------------------------------------------------------------------
@query(
    "datapipe_tfidf_top_terms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE doc_id < 50)
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                     AS tok
              FROM documents WHERE doc_id < 50)
        GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id < 50),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * ln(n_docs * 1.0 / df.df), 6) AS tfidf
        FROM tf JOIN df USING (tok), n
    )
    SELECT doc_id, tok, tfidf, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def datapipe_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))  # 1-row, broadcast
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    return top_k_per_group(
        scored,
        ["doc_id"],
        [F.col("tfidf").desc(), F.col("tok")],
        k=3,
    )


# --------------------------------------------------------------------
# IVF (inverted-file) ANN: the second scale path for similarity
# search, complementary to LSH. A seeded coarse quantizer partitions
# the corpus into cells; each query probes only its nprobe nearest
# cells, then brute-forces cosine inside them. Search cost =
# nprobe/k of the corpus.
#
# Scale design (the FAISS/IVF standard): the quantizer is trained on
# a BOUNDED sample collected through the guarded-toPandas cap — at
# 100 TB you never fit on the full corpus, a few thousand vectors
# pin the cell structure. Training is seeded Lloyd on that sample
# (driver-side, microseconds); the expensive part — assigning every
# corpus vector to its cell — stays distributed as a pure JVM
# expression (struct-argmin over broadcast centroid literals), one
# map-only pass with zero shuffles and no per-call iterative jobs.
# Centroids are memoized per (sf_dir, k_cells) so repeated calls
# (tests, recall sweeps) pay the fit once.
# Quantizer isn't SQL-expressible -> rows-only check; recall vs
# brute force is pinned by tests/test_operators.py.
# --------------------------------------------------------------------
_IVF_CENTROIDS: dict[tuple[str, int], "list[list[float]]"] = {}
_IVF_TRAIN_CAP = 4096


def _ivf_fit_centroids(
    spark: SparkSession, sf_dir: str, k_cells: int
) -> "list[list[float]]":
    """Seeded Lloyd iterations on a capped training sample; returns
    plain nested lists so the memo is session-independent."""
    import numpy as np
    import os

    key = (os.path.realpath(sf_dir), k_cells)
    if key in _IVF_CENTROIDS:
        return _IVF_CENTROIDS[key]

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double_array("embedding").alias("v"))
        .filter(F.col("v").isNotNull())  # NULL vectors can't train cells
    )
    # limit() already enforces the guarded-toPandas bound structurally,
    # so skip the guard's count() pre-pass (one Spark job saved)
    sample = emb.orderBy("vec_id").limit(_IVF_TRAIN_CAP).toPandas()
    x = np.array(sample["v"].tolist())
    if len(x) == 0:  # zero-row corpus: nothing to index, no cells
        _IVF_CENTROIDS[key] = []
        return []
    rng = np.random.RandomState(42)
    k_cells = min(k_cells, len(x))  # tiny corpora: one cell per vector
    centers = x[rng.choice(len(x), size=k_cells, replace=False)]
    for _ in range(20):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)
        new = np.array(
            [
                x[cell == i].mean(axis=0) if (cell == i).any() else centers[i]
                for i in range(k_cells)
            ]
        )
        if np.allclose(new, centers):
            break
        centers = new
    _IVF_CENTROIDS[key] = [[float(v) for v in c] for c in centers]
    return _IVF_CENTROIDS[key]


_IVF_CELL_EXPRS: dict[tuple, Column] = {}


def _ivf_cell_expr(centroids: "list[list[float]]") -> Column:
    """argmin-distance cell id as a pure JVM expression: ONE transform
    over the array-of-centroids literal building (squared_distance,
    cell) structs, reduced with array_min (struct ordering = distance,
    then cell id). Built as a single SQL string — constructing
    k_cells*dim literals through py4j Column calls cost more than the
    whole scan — and memoized on the centroid identity so repeated
    calls skip the parse."""
    # key on the VALUES — id() can be reused after gc, handing a
    # different centroid list someone else's cached expression
    key = tuple(tuple(c) for c in centroids)
    if key in _IVF_CELL_EXPRS:
        return _IVF_CELL_EXPRS[key]
    cent_sql = "array(" + ",".join(
        "array(" + ",".join(repr(x) for x in c) + ")" for c in centroids
    ) + ")"
    col = F.expr(
        f"array_min(transform({cent_sql}, (c, i) -> struct("
        "aggregate(zip_with(v, c, (a, b) -> (a-b)*(a-b)), "
        "cast(0.0 as double), (acc, x) -> acc + x) AS d, "
        "i AS cell))).cell"
    )
    _IVF_CELL_EXPRS[key] = col
    return col


@query("datapipe_knn_ivf")
def datapipe_knn_ivf(
    spark: SparkSession, sf_dir: str, k_cells: int = 16, nprobe: int = 4
) -> DataFrame:
    import numpy as np

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double_array("embedding").alias("v"))
        # NULL vectors are neither indexable nor searchable
        .filter(F.col("v").isNotNull())
    )
    centroid_lists = _ivf_fit_centroids(spark, sf_dir, k_cells)
    if not centroid_lists:
        # empty corpus: a similarity search legitimately returns no
        # neighbors (same schema as the populated path)
        return spark.createDataFrame(
            [], "query_id BIGINT, vec_id BIGINT, cosine DOUBLE, rank INT"
        )
    assigned = emb.select(
        "vec_id", "v", _ivf_cell_expr(centroid_lists).alias("cell")
    )

    # nprobe nearest cells per query: computed on the tiny centroid
    # set driver-side (k_cells rows), then broadcast as a filter
    centroids = np.array(centroid_lists)
    queries = {
        r["vec_id"]: np.array(r["v"])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    }
    probe_rows = []
    for qid, qv in queries.items():
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:nprobe]:
            probe_rows.append((qid, int(cell)))
    probes = spark.createDataFrame(probe_rows, "query_id BIGINT, cell INT")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    cands = (
        assigned.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity("qv", "v").alias("cosine"),
        )
    )
    return top_k_per_group(
        cands,
        ["query_id"],
        [F.round("cosine", 6).desc(), F.col("vec_id")],
        k=3,
    )


# --------------------------------------------------------------------
# Array-function batch (§2.9 extended surface): sort / slice /
# position / contains / distinct-count over the token arrays — the
# portable array toolkit, one map-only pass.
# --------------------------------------------------------------------
@query(
    "datapipe_array_funcs",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(toks))[1:3], ' ')
               AS first3_sorted,
           len(toks) AS n_tokens,
           list_position(toks, 'spark') AS spark_pos,
           list_contains(toks, 'table') AS has_table,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def datapipe_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens("text")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        # space-joined, not an array: the driver's canonicalizer only
        # hashes scalar cells (see test_oracle_paired_schemas_are_scalar)
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), " "
        ).alias("first3_sorted"),
        F.size(toks).alias("n_tokens"),
        F.array_position(toks, "spark").cast("int").alias("spark_pos"),
        F.array_contains(toks, "table").alias("has_table"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
    )


# --------------------------------------------------------------------
# Dedup survivors: materialize the cleaned corpus — docs that are
# their own cluster representative — and report the per-source yield.
# Cluster assignment is the O(docs) LSH pass; the survivor filter is
# a join back on doc_id (broadcastable at dim sizes, sort-merge at
# corpus scale).
# --------------------------------------------------------------------
@query(
    "datapipe_dedup_survivors",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    bucket_min AS (
        SELECT band_id, band_key, MIN(doc_id) AS bucket_rep
        FROM bands GROUP BY band_id, band_key
    ),
    reps AS (
        SELECT b.doc_id, MIN(m.bucket_rep) AS rep_id
        FROM bands b
        JOIN bucket_min m
          ON m.band_id = b.band_id AND m.band_key = b.band_key
        GROUP BY b.doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r.rep_id = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors
    FROM documents d JOIN reps r ON r.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def datapipe_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    reps = datapipe_neardup_clusters(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docs.join(reps, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("rep_id") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_survivors"),
        )
    )


# --------------------------------------------------------------------
# Histogram via width_bucket: document-length distribution — the
# profiling query behind every curation threshold choice. Bucket
# boundaries are exact integer comparisons.
# --------------------------------------------------------------------
@query(
    "datapipe_length_histogram",
    oracle="""
    SELECT CASE WHEN n_chars < 0 THEN 0
                WHEN n_chars >= 500 THEN 11
                ELSE n_chars // 50 + 1 END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY bucket
    """,
)
def datapipe_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy(
            F.width_bucket("n_chars", F.lit(0), F.lit(500), F.lit(10)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------
# Multimodal frame sampling: evenly-spaced frame-index selection from
# typed metadata, then a per-frame fingerprint — the video analog of
# fake_decode_meta (the real frame decoder is the documented stub; the
# index arithmetic, explode shape, and per-frame feature plumbing are
# exact and oracle-checked). Pure expressions end-to-end: sequence ->
# transform -> array_distinct -> posexplode; no Python in the plan.
# Scale: the explode multiplies rows by <= k (bounded fan-out), and
# everything stays map-side — no shuffle at all.
# --------------------------------------------------------------------
@query(
    "datapipe_frame_sample",
    oracle="""
    SELECT doc_id, n_frames, frame_idx,
           md5(text || '#' || frame_idx) AS frame_fp
    FROM (
        SELECT doc_id, text, n_frames,
               unnest(list_distinct([CAST(floor(i * n_frames / 3) AS INT)
                                     for i in range(0, 3)])) AS frame_idx
        FROM (
            SELECT doc_id, text, 1 + strlen(text) % 7 AS n_frames
            FROM documents WHERE text IS NOT NULL
        )
    )
    """,
)
def datapipe_frame_sample(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Sample up to ``k`` evenly spaced frames per document. n_frames
    derives from payload byte length exactly like fake_decode_meta's
    fake_n_frames; the frame fingerprint (md5 of payload + index)
    stands in for the decoded-frame feature vector. NULL payloads
    have no frames (without the filter, array_distinct keeps a NULL
    index Spark-side while DuckDB's list_distinct drops it)."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .withColumn(
            "n_frames", (F.lit(1) + F.octet_length("text") % 7).cast("int")
        )
    )
    idx = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.floor(i * F.col("n_frames") / k).cast("int"),
        )
    )
    return (
        docs.select(
            "doc_id", "text", "n_frames", F.explode(idx).alias("frame_idx")
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.md5(
                F.concat(
                    F.col("text"), F.lit("#"), F.col("frame_idx").cast("string")
                )
            ).alias("frame_fp"),
        )
    )


# --------------------------------------------------------------------
# Edit-distance near-dup verification: the third verify family after
# token-set Jaccard and shingle Jaccard — order-sensitive and
# character-level (catches small in-token edits both token metrics
# miss). Same bucket-gated candidate generation; Levenshtein runs on
# a bounded 200-char prefix because edit distance is O(L^2) per pair —
# at scale you NEVER run it on unbounded text, and the prefix bound
# makes worst-case cost per pair a constant. Integer distance over
# integer lengths -> exact similarity on both engines.
# --------------------------------------------------------------------
_LEV_PREFIX = 200


@query(
    "datapipe_neardup_editdist",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    sized AS (
        SELECT band_id, band_key, doc_id,
               COUNT(*) OVER (PARTITION BY band_id, band_key) AS n_bucket
        FROM bands
    ),
    small AS (
        SELECT band_id, band_key, doc_id FROM sized
        WHERE n_bucket BETWEEN 2 AND {_PAIR_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM small a JOIN small b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    pref AS (SELECT doc_id, substring(text, 1, {_LEV_PREFIX}) AS p
             FROM documents)
    SELECT doc_a, doc_b,
           CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS edit_dist,
           1.0 - levenshtein(pa.p, pb.p) * 1.0 /
                 greatest(len(pa.p), len(pb.p)) AS edit_sim
    FROM cand
    JOIN pref pa ON pa.doc_id = doc_a
    JOIN pref pb ON pb.doc_id = doc_b
    """,
)
def datapipe_neardup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _bands(_signatures(spark, sf_dir))

    # Round-11 rewrite: same bounded per-bucket array explosion as
    # datapipe_neardup_pairs (see the comment there) — the 2..cap
    # gate bounds the array by construction, no window, no self-join
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_set("doc_id").alias("ds"))
        .filter(F.size("ds").between(2, _PAIR_BUCKET_CAP))
    )
    cand = (
        buckets.select(F.explode("ds").alias("doc_a"), F.col("ds"))
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    pref = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _LEV_PREFIX).alias("p")
    )
    pa, pb = pref.alias("pa"), pref.alias("pb")
    lev = F.levenshtein(F.col("pa.p"), F.col("pb.p"))
    sim = F.lit(1.0) - lev * 1.0 / F.greatest(
        F.length("pa.p"), F.length("pb.p")
    )
    return (
        cand.join(pa, F.col("pa.doc_id") == F.col("doc_a"))
        .join(pb, F.col("pb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_dist"),
            sim.alias("edit_sim"),
        )
    )


# --------------------------------------------------------------------
# VariantType path for semi-structured props (Spark 4): parse_json
# once into the binary variant encoding, then typed variant_get
# extraction — the modern alternative to from_json-with-schema when
# the JSON shape is open-ended (shredded storage, no schema
# declaration, per-path typed access). Same rollup + oracle as the
# from_json twin, so the two parse strategies are provably
# interchangeable. At scale variant beats repeated json string
# parsing: one decode, many cheap typed gets.
# --------------------------------------------------------------------
@query(
    "datapipe_props_variant",
    # same guarded oracle as datapipe_props_json — see that comment
    oracle="""
    WITH k AS (
        SELECT CASE WHEN props IS NOT NULL AND json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.k')
                                  AS INTEGER)
               END AS k
        FROM events
    )
    SELECT k % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           MIN(k) AS k_min,
           MAX(k) AS k_max
    FROM k GROUP BY k_bucket
    """,
)
def datapipe_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    # try_parse_json: one malformed props row must not abort a
    # corpus-scale job (parse_json raises under ANSI)
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        load(spark, sf_dir, "events")
        .select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# --------------------------------------------------------------------
# RAG-ingest capstone: the end-to-end chunk-and-embed pipeline a
# retrieval corpus build runs — document -> fixed-size chunks (the
# Python UDTF via LATERAL) -> per-chunk token count + deterministic
# hash embedding (md5-derived, the classic feature-hashing trick:
# byte pairs of the digest scaled to [0,1] — a stand-in with the same
# schema/cost shape as a real encoder, exactly reproducible in SQL).
# Everything after the UDTF is codegen'd expressions; the embedding
# array is ready for the ANN/near-dup operators upstream. One scan,
# no shuffle (the LATERAL expansion is map-side).
# --------------------------------------------------------------------
_EMB_DIMS = 8


@query(
    "datapipe_rag_ingest",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id,
               CAST((i - 1) // 50 AS INT) AS chunk_idx,
               array_to_string(toks[i:i+49], ' ') AS chunk_text
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(range(1, len(toks) + 1, 50)) AS u(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens,
           array_to_string(
               [CAST((instr('0123456789abcdef',
                       substring(md5(chunk_text), 2 * j - 1, 1)) - 1) * 16
                + (instr('0123456789abcdef',
                         substring(md5(chunk_text), 2 * j, 1)) - 1)
                   AS VARCHAR)
                FOR j IN range(1, {_EMB_DIMS + 1})],
               ',') AS hash_embedding_csv
    FROM chunks
    """,
)
def datapipe_rag_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udtfs import ChunkDocuments
    from ..sources.catalog import register_all

    spark.udtf.register("chunk_documents", ChunkDocuments)
    register_all(spark, sf_dir, tables=["documents"])
    chunks = spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text FROM documents, "
        "LATERAL chunk_documents(doc_id, text) AS c"
    )
    # byte j of md5(chunk) as a double — hex-pair arithmetic identical
    # to the oracle's instr() construction
    # byte values are integral by construction, so the CSV encoding is
    # lossless; scalar-only output keeps the driver's canonicalizer
    # happy (see test_oracle_paired_schemas_are_scalar)
    emb = F.array(
        *[
            F.expr(
                f"CAST((instr('0123456789abcdef', "
                f"substring(md5(chunk_text), {2 * j - 1}, 1)) - 1) * 16"
                f" + (instr('0123456789abcdef', "
                f"substring(md5(chunk_text), {2 * j}, 1)) - 1) AS STRING)"
            )
            for j in range(1, _EMB_DIMS + 1)
        ]
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(F.split("chunk_text", " ")).cast("long").alias("n_tokens"),
        F.array_join(emb, ",").alias("hash_embedding_csv"),
    )


# --------------------------------------------------------------------
# PII scrubbing: the redaction pass every training-data pipeline runs
# before anything else — regexp_replace for email/phone shapes, plus
# counts of what was redacted (the audit trail). Pure map-side
# codegen'd regex work, zero shuffle until the audit rollup. Patterns
# stay in the RE2-compatible subset so Spark (Java regex) and DuckDB
# (RE2) agree character-for-character; the scrubbed-text sha256 proves
# byte-identical redaction output across engines, not just counts.
# --------------------------------------------------------------------
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "datapipe_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           sha256(regexp_replace(
               regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_fp
    FROM documents
    """,
)
def datapipe_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))
        ).cast("long").alias("n_emails"),
        F.size(
            F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))
        ).cast("long").alias("n_phones"),
        F.sha2(scrubbed, 256).alias("scrubbed_fp"),
    )


# --------------------------------------------------------------------
# Repetition filter (the Gopher/MassiveText quality rule family):
# fraction of the doc covered by its most-repeated trigram. Docs whose
# top shingle dominates are boilerplate/spam and get dropped before
# training. shingles -> explode -> per-(doc, shingle) count ->
# per-doc max/total: one map-side expansion and one combinable
# group-by, exact-integer ratio.
# --------------------------------------------------------------------
@query(
    "datapipe_repetition_filter",
    oracle="""
    WITH sh AS (
        SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')
                               FOR i IN range(1, greatest(len(toks) - 1, 1))])
                   AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3
    ),
    freq AS (
        SELECT doc_id, shingle, COUNT(*) AS n
        FROM sh GROUP BY doc_id, shingle
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS top_shingle_n,
           CAST(SUM(n) AS BIGINT) AS n_shingles,
           MAX(n) * 1.0 / SUM(n) AS top_shingle_ratio,
           MAX(n) * 1.0 / SUM(n) > 0.2 AS is_repetitive
    FROM freq GROUP BY doc_id
    """,
)
def datapipe_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = (
        load(spark, sf_dir, "documents", fan_out_by=("doc_id",))
        .filter(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id", F.explode(ngram_shingles("text", 3)).alias("shingle")
        )
    )
    freq = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("n"))
    ratio = F.max("n") * 1.0 / F.sum("n")
    return freq.groupBy("doc_id").agg(
        F.max("n").alias("top_shingle_n"),
        F.sum("n").alias("n_shingles"),
        ratio.alias("top_shingle_ratio"),
        (ratio > 0.2).alias("is_repetitive"),
    )


# --------------------------------------------------------------------
# Benchmark decontamination: flag training docs sharing any 5-gram
# with a held-out benchmark set (here: doc_id < 5 stands in for the
# eval suite) — the overlap check every serious pretraining corpus
# runs. The benchmark shingle set is tiny -> BROADCAST semi-join
# against the corpus's exploded shingles: one map-side expansion, no
# corpus shuffle, contaminated docs come back as a distinct id set
# with the matching shingle count as evidence.
# --------------------------------------------------------------------
@query(
    "datapipe_decontamination",
    oracle="""
    WITH bench AS (
        SELECT DISTINCT unnest([array_to_string(toks[i:i+4], ' ')
                                FOR i IN range(1, greatest(len(toks) - 3, 1))])
                   AS shingle
        FROM (SELECT string_split(text, ' ') AS toks
              FROM documents WHERE doc_id < 5)
        WHERE len(toks) >= 5
    ),
    corpus AS (
        SELECT doc_id, unnest([array_to_string(toks[i:i+4], ' ')
                               FOR i IN range(1, greatest(len(toks) - 3, 1))])
                   AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id >= 5)
        WHERE len(toks) >= 5
    )
    SELECT c.doc_id,
           CAST(COUNT(DISTINCT c.shingle) AS BIGINT) AS n_overlapping
    FROM corpus c JOIN bench b ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """,
)
def datapipe_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 5
    )
    bench = (
        docs.filter(F.col("doc_id") < 5)
        .select(F.explode(ngram_shingles("text", 5)).alias("shingle"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") >= 5).select(
        "doc_id", F.explode(ngram_shingles("text", 5)).alias("shingle")
    )
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_overlapping"))
    )


# ====================================================================
# Training-data assembly: packing, sharding, sampling, quality scoring
# ====================================================================
_PACK_CTX = 256  # tokens per packed training sequence


@query(
    "datapipe_pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        FROM documents
    ),
    off AS (
        SELECT source, doc_id, tok,
               CAST(COALESCE(SUM(tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_start
        FROM sized
    ),
    spans AS (
        SELECT source, doc_id, tok, tok_start,
               unnest(range(tok_start // {_PACK_CTX},
                            (tok_start + tok - 1) // {_PACK_CTX} + 1)) AS chunk_id
        FROM off
    )
    SELECT source, chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(least(tok_start + tok, (chunk_id + 1) * {_PACK_CTX})
                    - greatest(tok_start, chunk_id * {_PACK_CTX})) AS BIGINT)
               AS n_tokens
    FROM spans
    GROUP BY source, chunk_id
    """,
)
def datapipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate each shard's documents
    in deterministic (doc_id) order and cut every ``_PACK_CTX`` tokens;
    report how many docs and tokens land in each packed sequence.

    Scale: the cumulative-offset window is partitioned by ``source``
    (the shard key) — real pipelines pack per shard, so no global sort
    ever appears; each shard's packing is an independent task. The doc
    -> chunk fan-out via ``sequence``/``explode`` is map-side; the only
    shuffle is the final (source, chunk_id) group-by. Mirrors the
    reference's batch-assembly role (scripts/03_feature_engineering.py
    builds fixed windows per drive the same partition-local way).
    """
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = F.lit(_PACK_CTX).cast("long")
    sized = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("tok"),
    )
    off = sized.withColumn(
        "tok_start", F.coalesce(F.sum("tok").over(w), F.lit(0).cast("long"))
    )
    spans = off.select(
        "source",
        "tok",
        "tok_start",
        F.explode(
            F.sequence(
                F.expr(f"tok_start div {_PACK_CTX}"),
                F.expr(f"(tok_start + tok - 1) div {_PACK_CTX}"),
            )
        ).alias("chunk_id"),
    )
    contrib = F.least(
        F.col("tok_start") + F.col("tok"), (F.col("chunk_id") + 1) * c
    ) - F.greatest(F.col("tok_start"), F.col("chunk_id") * c)
    return (
        spans.groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(contrib).alias("n_tokens"),
        )
    )


@query(
    "datapipe_stratified_sample",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                              < (CASE WHEN source = 'src0' THEN '8'
                                      WHEN source = 'src1' THEN '4'
                                      ELSE '2' END)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents
    GROUP BY source
    """,
)
def datapipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-source) deterministic sampling — the data-mixture
    op: each stratum gets its own keep-rate (src0 50%, src1 25%, rest
    12.5%), decided by comparing the first hex digit of ``md5(doc_id)``
    against a per-stratum threshold.

    Scale: the keep decision is a pure map (hash + string compare), so
    sampling 100 TB is one scan with zero shuffle before the per-source
    tally; rates are exact corpus-wide without coordination because the
    hash is the randomness. This is the deterministic twin of
    ``df.sampleBy`` (X1's per-stratum analogue) — same pattern as
    ``ref_union_downsample``'s hash-threshold trick.
    """
    thresh = (
        F.when(F.col("source") == "src0", F.lit("8"))
        .when(F.col("source") == "src1", F.lit("4"))
        .otherwise(F.lit("2"))
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < thresh
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(keep.cast("long")).alias("n_kept"),
        )
    )


@query(
    "datapipe_global_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
               md5(CAST(doc_id AS VARCHAR)) AS skey
        FROM documents
    )
    SELECT CAST((16 * (instr('0123456789abcdef', substring(skey, 1, 1)) - 1)
                 + (instr('0123456789abcdef', substring(skey, 2, 1)) - 1))
                % 8 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           MIN(skey) AS first_key
    FROM keyed
    GROUP BY shard
    """,
)
def datapipe_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training readers:
    every doc gets a pseudorandom sort key ``md5(doc_id)``; the first
    two hex digits route it to one of 8 shards, and readers stream each
    shard ordered by the key — a reproducible corpus-wide shuffle with
    no RNG state.

    Scale: shard assignment is map-side; the per-shard tally shuffles 8
    tiny rows. The actual 100 TB materialization would be
    ``repartitionByRange(n_shards, skey)`` + parquet write — same key,
    same math, and re-running it yields byte-identical shard contents
    (the property ``ref_random_order_limit`` can't give).
    """
    hexv = "instr('0123456789abcdef', substring(skey, {p}, 1)) - 1"
    shard = F.expr(
        f"CAST(((16 * ({hexv.format(p=1)})) + ({hexv.format(p=2)})) % 8 AS BIGINT)"
    )
    return (
        load(spark, sf_dir, "documents")
        .select(
            F.size(F.split("text", " ")).cast("long").alias("tok"),
            F.md5(F.col("doc_id").cast("string")).alias("skey"),
        )
        .groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.min("skey").alias("first_key"),
        )
    )


@query(
    "datapipe_quality_classifier",
    oracle="""
    WITH feats AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               ((16 * (instr('0123456789abcdef', substring(md5(term), 1, 1)) - 1)
                 + (instr('0123456789abcdef', substring(md5(term), 2, 1)) - 1))
                % 21) - 10 AS w
        FROM feats
    )
    SELECT doc_id,
           CAST(SUM(w) AS BIGINT) AS score_sum,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(w) >= 0 AS BOOLEAN) AS keep
    FROM scored
    GROUP BY doc_id
    """,
)
def datapipe_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality classifier scoring: hash each distinct
    token into a 256-bucket feature space, look up an integer weight
    per bucket (here a closed-form ``(bucket % 21) - 10`` so both
    engines agree bit-for-bit; production would broadcast a learned
    weight array), sum per doc, threshold at 0.

    Scale: classic hashing-trick linear model — the whole scoring pass
    is map-side (md5 + arithmetic, JVM codegen, no Python), one
    group-by per doc, and a real weight vector is a few MB broadcast.
    This is how corpus-quality gates (CCNet/fastText filters) run over
    100 TB: embarrassingly parallel, zero model-serving infra.
    """
    bucket = (
        "((16 * (instr('0123456789abcdef', substring(md5(term), 1, 1)) - 1)"
        " + (instr('0123456789abcdef', substring(md5(term), 2, 1)) - 1)))"
    )
    w = F.expr(f"({bucket} % 21) - 10")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(unique_tokens("text")).alias("term"))
        .groupBy("doc_id")
        .agg(
            F.sum(w).cast("long").alias("score_sum"),
            F.count(F.lit(1)).alias("n_feats"),
            (F.sum(w) >= 0).alias("keep"),
        )
    )


@query(
    "datapipe_token_histogram_map",
    oracle="""
    WITH cnts AS (
        SELECT doc_id, term, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
           CAST(COALESCE(SUM(CASE WHEN term = 'the' THEN cnt END), 0)
                AS BIGINT) AS n_the,
           CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeated_terms
    FROM cnts
    GROUP BY doc_id
    """,
)
def datapipe_token_histogram_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token histogram materialized as a MAP column
    (``map_from_entries``), then interrogated with the map-function
    family — ``element_at`` (count of 'the'), ``map_filter`` (terms
    appearing twice or more), ``size``. The map itself never leaves the
    executor: outputs are scalars, so cross-engine comparison is exact
    while the Spark plan genuinely exercises the map operators.

    Scale: histogram maps are per-doc (bounded by vocabulary of one
    document), built after the (doc_id, term) count — the same O(tokens)
    shuffle every other text op pays. Keeping maps out of shuffles/sinks
    (derive scalars first) is the 100 TB pattern: wide map columns kill
    row-group stats and shuffle compression."""
    cnts = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = cnts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "cnt"))
        ).alias("h")
    )
    return hist.select(
        "doc_id",
        F.size("h").cast("long").alias("n_distinct_terms"),
        F.coalesce(F.element_at("h", F.lit("the")), F.lit(0).cast("long")).alias(
            "n_the"
        ),
        F.size(F.map_filter("h", lambda k, v: v >= 2)).cast("long").alias(
            "n_repeated_terms"
        ),
    )


_MIX_BUDGET = 100_000  # total training tokens to assemble


@query(
    "datapipe_mixture_plan",
    oracle=f"""
    WITH avail AS (
        SELECT source,
               CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                    AS BIGINT) AS avail_tokens,
               CASE WHEN source = 'src0' THEN 5
                    WHEN source = 'src1' THEN 3 ELSE 2 END AS weight
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS wsum FROM avail)
    SELECT a.source,
           a.avail_tokens,
           CAST(({_MIX_BUDGET} * a.weight) // t.wsum AS BIGINT)
               AS target_tokens,
           CAST((({_MIX_BUDGET} * a.weight) // t.wsum + a.avail_tokens - 1)
                // a.avail_tokens AS BIGINT) AS epochs,
           CAST((({_MIX_BUDGET} * a.weight) // t.wsum) * 1000000
                // a.avail_tokens AS BIGINT) AS rate_ppm
    FROM avail a, tot t
    """,
)
def datapipe_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planner: given per-domain target weights and a
    global token budget, compute each source's target token count, the
    number of epochs (repeats) needed when the domain is smaller than
    its target (upsampling, epochs > 1), and the sampling rate in
    parts-per-million when it is larger (downsampling, rate < 1e6).
    Every quantity is exact integer arithmetic — the plan is
    reproducible and auditable, which matters when the mixture IS the
    training recipe.

    Scale: one scan -> per-source token tally (tiny shuffle) -> a
    broadcast of the 1-row weight total. The expensive part (actually
    materializing the mixture) is ``datapipe_stratified_sample``'s
    hash-threshold pass with ``rate_ppm`` as the threshold."""
    w = (
        F.when(F.col("source") == "src0", F.lit(5))
        .when(F.col("source") == "src1", F.lit(3))
        .otherwise(F.lit(2))
        .cast("long")
    )
    avail = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " ")).cast("long")).alias("avail_tokens"))
        .withColumn("weight", w)
    )
    tot = avail.agg(F.sum("weight").alias("wsum"))
    target = F.expr(f"({_MIX_BUDGET} * weight) div wsum")
    return (
        avail.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "avail_tokens",
            target.alias("target_tokens"),
            F.expr(
                f"((({_MIX_BUDGET} * weight) div wsum) + avail_tokens - 1)"
                " div avail_tokens"
            ).alias("epochs"),
            F.expr(
                f"((({_MIX_BUDGET} * weight) div wsum) * 1000000) div avail_tokens"
            ).alias("rate_ppm"),
        )
    )


# --------------------------------------------------------------------
# Count-min sketch heavy hitters. A CM sketch is a d×w grid of
# counters; each key increments one counter per row (md5-salted
# bucket), and a key's estimate is the MIN over its d counters —
# always >= the true count, with the overestimate bounded by
# (2/w)·total with prob 1-(1/2)^d. The grid is a SUM of per-partition
# grids, i.e. a map-side-combinable groupBy on (row, bucket): the
# whole 100 TB stream shuffles only d·w cells per partition, and two
# sketches built on different data slices merge by cell-wise addition
# — this is the mergeable-summaries pattern (Agarwal et al., "Mergeable
# Summaries", PODS'12) that exact per-key counting cannot offer when
# the key space itself doesn't fit anywhere.
#
# Everything is deterministic (salted md5 buckets, integer counters),
# so unlike most sketches this one is oracle-paired exactly: DuckDB
# rebuilds the identical grid and the identical estimates. A pytest
# pins the CM guarantee estimate >= exact on every probe.
# --------------------------------------------------------------------
_CM_D = 3  # sketch rows
_CM_W = 256  # buckets per row (2 hex digits)


def _cm_bucket_sql(row_expr: str, key_expr: str) -> str:
    """Portable md5-hex -> [0, 256) bucket: two instr'd hex digits.
    ``row_expr``/``key_expr`` are SQL fragments, identical in Spark
    and DuckDB."""
    h = f"md5(concat('cm', {row_expr}, '|', {key_expr}))"
    return (
        f"((instr('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substring({h}, 2, 1)) - 1)"
    )


_CM_ROWS_SQL = " UNION ALL ".join(
    "SELECT {i} AS r, {b} AS bucket FROM ev".format(
        i=i, b=_cm_bucket_sql(f"'{i}'", "u")
    )
    for i in range(_CM_D)
)

_CM_ROWS_LIST = "[" + ", ".join(str(i) for i in range(_CM_D)) + "]"

_CM_ORACLE = f"""
WITH ev AS (SELECT user_id, CAST(user_id AS VARCHAR) AS u FROM events),
cells AS (
    SELECT r, bucket, COUNT(*) AS cnt
    FROM ({_CM_ROWS_SQL}) all_rows
    GROUP BY r, bucket
),
exact AS (
    SELECT user_id, COUNT(*) AS exact_n FROM ev GROUP BY user_id
    ORDER BY exact_n DESC, user_id LIMIT 10
),
probes AS (
    SELECT user_id, exact_n, r,
           {_cm_bucket_sql("CAST(r AS VARCHAR)", "CAST(user_id AS VARCHAR)")}
               AS bucket
    FROM exact CROSS JOIN (SELECT unnest({_CM_ROWS_LIST}) AS r) rows_
)
SELECT user_id, exact_n, MIN(cnt) AS cm_estimate
FROM probes JOIN cells USING (r, bucket)
GROUP BY user_id, exact_n
"""


def cm_sketch(ev: DataFrame) -> DataFrame:
    """The d×w counter grid for a DataFrame with a string key column
    ``u`` — a map-side-combinable groupBy, so grids built on disjoint
    slices merge by cell-wise ``cnt`` addition (pinned by
    ``tests/test_properties.py::test_countmin_merge_and_bound``)."""
    cell_structs = [
        F.struct(
            F.lit(i).alias("r"),
            F.expr(_cm_bucket_sql(f"'{i}'", "u")).alias("bucket"),
        )
        for i in range(_CM_D)
    ]
    return (
        ev.select(F.explode(F.array(*cell_structs)).alias("rb"))
        .select("rb.r", "rb.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("datapipe_countmin_heavy_hitters", oracle=_CM_ORACLE)
def datapipe_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 3×256 count-min sketch over ``events.user_id``, then
    report the top-10 exact-count users alongside their CM estimates.
    The exact counts exist only to exhibit the estimate-vs-truth gap
    on the fixture; at 100 TB the sketch alone (768 cells) is the
    deliverable and the exact groupBy is the thing being avoided.

    Plan shape: one scan -> explode to d rows -> partial-agg'd
    groupBy on (r, bucket) (shuffle is O(d·w) per partition, NOT
    O(keys)); probes join the 768-cell grid via broadcast."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("user_id").cast("string").alias("u")
    )
    sketch = cm_sketch(ev)
    w = Window.orderBy(F.col("exact_n").desc(), "user_id")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )
    probes = exact.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        F.expr(
                            _cm_bucket_sql(
                                f"'{i}'", "CAST(user_id AS STRING)"
                            )
                        ).alias("bucket"),
                    )
                    for i in range(_CM_D)
                ]
            )
        ).alias("rb"),
    ).select("user_id", "exact_n", "rb.r", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


# --------------------------------------------------------------------
# Hard-negative mining for contrastive training: for each query
# vector, the most-similar corpus vectors with a DIFFERENT label —
# the "looks like a match but isn't" pairs that contrastive losses
# (InfoNCE, triplet) need to sharpen decision boundaries. Same
# broadcast-query / rank-pushdown plan as datapipe_cosine_topk with
# the label inequality applied BEFORE ranking; at corpus scale the
# candidate generator swaps to the LSH/IVF paths unchanged.
# --------------------------------------------------------------------
@query(
    "datapipe_hard_negatives",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, label AS query_label,
               embedding::DOUBLE[] AS qe
        FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL
    ), c AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings
        WHERE embedding IS NOT NULL
    ), sims AS (
        SELECT query_id, query_label, vec_id, label AS neg_label,
               list_dot_product(qe, ce) /
               (sqrt(list_dot_product(qe, qe)) *
                sqrt(list_dot_product(ce, ce))) AS cosine
        FROM q, c
        WHERE vec_id <> query_id AND label <> query_label
    )
    SELECT query_id, query_label, vec_id, neg_label, cosine, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(cosine, 6) DESC, vec_id) AS rank
        FROM sims WHERE cosine IS NOT NULL
    )
    WHERE rank <= 3
    """,
)
def datapipe_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same exclusion contract as datapipe_cosine_topk: NULL vectors
    # and undefined (zero-norm) cosines are not candidates
    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        as_double_array("embedding").alias("qe"),
    )
    c = emb.select(
        "vec_id",
        F.col("label").alias("neg_label"),
        as_double_array("embedding").alias("ce"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("neg_label") != F.col("query_label"))
        )
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "neg_label",
            cosine_similarity("qe", "ce").alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return top_k_per_group(
        sims,
        ["query_id"],
        [F.round("cosine", 6).desc(), F.col("vec_id")],
        k=3,
    )



# --------------------------------------------------------------------
# Train/eval split-leakage audit: after splitting the corpus, count
# eval documents that near-duplicate a TRAIN document — leaked eval
# data silently inflates benchmark scores, so this audit belongs next
# to the split op in any serious pipeline. Signatures are MinHash
# over word-5-gram shingles (unigram MinHash saturates on this
# fixture's small shared vocabulary — every doc "collides"; 5-gram
# shingles are the decontamination-grade signal), banded 2×2; an
# eval doc is contaminated if it shares any band key with any train
# doc — a band-key semi-join, so the corpus-pair space is never
# materialized (same no-cartesian property as the dedup family;
# O(docs) shuffle). Split rule is deterministic (doc_id % 5 == 0 ->
# eval) so both engines agree exactly.
# --------------------------------------------------------------------
_LEAK_SIG_SQL = """
    SELECT doc_id,
           MIN(md5('s0|' || shingle)) AS mh0,
           MIN(md5('s1|' || shingle)) AS mh1,
           MIN(md5('s2|' || shingle)) AS mh2,
           MIN(md5('s3|' || shingle)) AS mh3
    FROM (
        SELECT doc_id, unnest(list_distinct([
            toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                    || toks[i+3] || ' ' || toks[i+4]
            for i in range(1, greatest(len(toks) - 3, 1))
        ])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
    )
    GROUP BY doc_id
"""


@query(
    "datapipe_split_leakage_audit",
    oracle=f"""
    WITH sig AS ({_LEAK_SIG_SQL}),
    banded AS (
        SELECT doc_id, doc_id % 5 = 0 AS is_eval, band_id, band_key
        FROM ({_BANDS_FROM_SIG_SQL})
    ),
    train_keys AS (
        SELECT DISTINCT band_id, band_key FROM banded WHERE NOT is_eval
    ),
    contaminated AS (
        SELECT DISTINCT b.doc_id
        FROM banded b JOIN train_keys t
          ON b.band_id = t.band_id AND b.band_key = t.band_key
        WHERE b.is_eval
    )
    SELECT
        (SELECT COUNT(*) FROM documents
         WHERE doc_id % 5 = 0 AND len(string_split(text, ' ')) >= 5)
            AS n_eval,
        (SELECT COUNT(*) FROM contaminated) AS n_leaked
    """,
)
def datapipe_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # sig (one row per doc with >= 1 five-gram shingle) feeds the
    # banded train side, the banded eval side AND the n_eval count —
    # unstaged, the 5-gram shingle explode + MinHash ran twice and a
    # third documents scan computed n_eval (round-13 scan sweep:
    # documents x3 in this plan). Staged, the corpus is tokenized
    # ONCE (guide §2.4).
    sig = stage_boundary(
        load(spark, sf_dir, "documents", fan_out_by=("doc_id",))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(ngram_shingles("text", 5))
            ).alias("shingle"),
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.min(minhash_expr("shingle", salt)).alias(f"mh{i}")
                for i, salt in enumerate(DEFAULT_SALTS)
            ]
        ),
        materialize=False,
    )
    banded = _bands(sig).withColumn(
        "is_eval", F.col("doc_id") % 5 == 0
    )
    train_keys = (
        banded.filter(~F.col("is_eval"))
        .select("band_id", "band_key")
        .distinct()
    )
    leaked = (
        banded.filter(F.col("is_eval"))
        # shuffle_hash hint: train_keys scales with the train corpus —
        # the semi join must shuffle, not broadcast-build, at scale
        .join(train_keys.hint("shuffle_hash"), ["band_id", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    # n_eval = eval docs that HAVE a signature. sig holds exactly one
    # row per doc with >= 1 five-gram shingle, and ngram_shingles
    # yields a shingle iff size(split(text, ' ')) >= 5 (NULL text
    # splits to NULL -> explode drops the doc; < 5 tokens yields the
    # guarded empty array) — so counting staged sig rows is EXACTLY
    # the oracle's `doc_id % 5 = 0 AND len(string_split(text,' ')) >= 5`
    # count, without the third full documents scan the old plan paid
    # (at 100 TB: one corpus pass total for this audit, was three).
    n_eval = (
        sig.filter(F.col("doc_id") % 5 == 0)
        .agg(F.count(F.lit(1)).alias("n_eval"))
    )
    return n_eval.crossJoin(F.broadcast(leaked))


# --------------------------------------------------------------------
# mapInArrow: the pyarrow-native partition map — completes the
# Python-crossing quartet (pandas_udf scalar / applyInPandas grouped /
# mapInPandas iterator / applyInArrow grouped-arrow; this is the
# ungrouped arrow iterator). Zero pandas hop: RecordBatch in,
# RecordBatch out, all columns computed with pyarrow.compute kernels
# (C++, zero-copy slices). Everything emitted is exact integers, so
# the oracle is a plain SQL twin.
# --------------------------------------------------------------------
@query(
    "datapipe_arrow_native_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(text) AS BIGINT) AS n_chars_utf8,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
    FROM documents WHERE doc_id % 20 = 0
    """,
)
def datapipe_arrow_native_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text stats computed entirely in pyarrow.compute inside
    ``mapInArrow``. A deliberate twin of the JVM-expression stats
    (datapipe_text_stats): same numbers, different execution
    substrate — the template for ops where a C++ Arrow kernel exists
    but no Spark builtin does (tokenizers, codecs).

    Scale: batch-at-a-time map, no shuffle; Arrow batches flow
    worker-side without row pickling (plan shows a single
    (Arrow)MapInArrow/Python map node, pinned by the registry-wide
    hygiene gate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stats(batches):
        for batch in batches:
            text = batch.column("text")
            n_chars = pc.utf8_length(text)
            n_tokens = pc.list_value_length(
                pc.split_pattern(text, pattern=" ")
            )
            n_nonspace = pc.utf8_length(
                pc.replace_substring(text, pattern=" ", replacement="")
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(n_chars, pa.int64()),
                    pc.cast(n_tokens, pa.int64()),
                    pc.cast(n_nonspace, pa.int64()),
                ],
                ["doc_id", "n_chars_utf8", "n_tokens", "n_nonspace"],
            )

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
    )
    return docs.mapInArrow(
        _stats,
        "doc_id long, n_chars_utf8 long, n_tokens long, n_nonspace long",
    )


# --------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis): pick k
# docs with probability proportional to weight (here: n_chars) by
# ranking on key = ln(u)/w with u a per-doc uniform — the one-pass,
# fully parallel algorithm for weighted reservoir sampling (Efraimidis
# & Spirakis, IPL 2006: u^(1/w) order == ln(u)/w order). u is
# md5-derived (16 bits via the portable instr-hex trick), so both
# engines draw the SAME uniforms and the sample is reproducible; the
# rank key is rounded with a doc_id tie-break, the same cross-engine
# float-ordering contract the cosine queries use.
# Scale: a global top-k — rank pushdown gives each partition a local
# top-k before the single-reducer merge; for per-stratum sampling,
# partition the window by the stratum instead.
# --------------------------------------------------------------------
def _hex16_sql(expr: str) -> str:
    """First 4 hex digits of md5(expr) as an integer 0..65535 —
    portable (instr arithmetic, no conv())."""
    terms = [
        f"(instr('0123456789abcdef', substring(md5({expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (3 - j)}"
        for j in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


_WS_U16 = _hex16_sql("'ws|' || CAST(doc_id AS VARCHAR)")
_WS_KEY_SQL = (
    "ROUND(ln(({u16} + 1) / CAST(65537 AS DOUBLE)) / n_chars, 9)".format(
        u16=_WS_U16
    )
)


@query(
    "datapipe_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars, rank
    FROM (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY {_WS_KEY_SQL} DESC, doc_id)
                   AS rank
        FROM documents WHERE n_chars > 0
    )
    WHERE rank <= 25
    """,
)
def datapipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_chars == 0 would divide by zero, and the engines disagree on
    # the result (Spark NULL vs DuckDB -inf) — exclude weightless docs
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars") > 0)
    )
    # Spark spells string concat differently ('||' works in both, but
    # CAST ... AS STRING vs VARCHAR); rebuild the identical key
    key = F.expr(
        _WS_KEY_SQL.replace("AS VARCHAR", "AS STRING")
    )
    w = Window.orderBy(key.desc(), "doc_id")
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 25)
        .select("doc_id", "n_chars", "rank")
    )


# --------------------------------------------------------------------
# Stratified A-ES weighted sampling — the per-stratum scale twin of
# datapipe_weighted_sample: k docs per language, weight-proportional
# without replacement via the same Efraimidis-Spirakis exponential
# keys (ln(u)/w order == u^(1/w) order) with md5-derived uniforms, so
# both engines draw identical samples. Where the global sample leans
# on LimitPushDownThroughWindow to stay single-reducer-safe, the
# stratified form is scale-native: the rank window partitions by the
# stratum, Catalyst plans WindowGroupLimit (per-partition top-k
# pre-filter before the exchange), and no task ever holds more than a
# stratum's local candidates. This is how a 100 TB curation pipeline
# draws per-language training quotas in one pass.
# --------------------------------------------------------------------
_WSS_U16 = _hex16_sql("'wss|' || CAST(doc_id AS VARCHAR)")
_WSS_KEY_SQL = (
    "ROUND(ln(({u16} + 1) / CAST(65537 AS DOUBLE)) / n_chars, 9)".format(
        u16=_WSS_U16
    )
)


@query(
    "datapipe_weighted_sample_stratified",
    oracle=f"""
    SELECT lang, doc_id, n_chars, rank
    FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_WSS_KEY_SQL} DESC, doc_id) AS rank
        FROM documents WHERE n_chars > 0 AND lang IS NOT NULL
    )
    WHERE rank <= 5
    """,
)
def datapipe_weighted_sample_stratified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("lang", "doc_id", "n_chars")
        .filter((F.col("n_chars") > 0) & F.col("lang").isNotNull())
    )
    key = F.expr(_WSS_KEY_SQL.replace("AS VARCHAR", "AS STRING"))
    w = Window.partitionBy("lang").orderBy(key.desc(), "doc_id")
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "doc_id", "n_chars", "rank")
    )


# --------------------------------------------------------------------
# Semantic dedup (SemDeDup-style, Abbas et al. 2023): cluster the
# corpus in EMBEDDING space (orthant-sign LSH buckets — the same
# bucketing datapipe_cosine_neardup uses), then keep one best
# document per cluster, ranked by a quality proxy (longest text,
# doc_id tie-break). Complements the lexical dedup family: MinHash
# catches copy-paste, embedding clusters catch paraphrases. The
# survivor pick is a rank-1 window per bucket — O(docs), WindowGroupLimit
# pushdown, and the pair space never exists.
# --------------------------------------------------------------------
@query(
    "datapipe_semantic_dedup",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               32 * (embedding[1] > 0)::INT + 16 * (embedding[2] > 0)::INT
               + 8 * (embedding[3] > 0)::INT + 4 * (embedding[4] > 0)::INT
               + 2 * (embedding[5] > 0)::INT + (embedding[6] > 0)::INT
                   AS bucket
        FROM embeddings
    ),
    ranked AS (
        SELECT bucket, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY bucket
                   ORDER BY n_chars DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY bucket) AS bucket_size
        FROM e JOIN documents ON vec_id = doc_id
    )
    SELECT bucket, doc_id AS survivor_doc_id, n_chars,
           CAST(bucket_size AS BIGINT) AS bucket_size
    FROM ranked WHERE rn = 1
    """,
)
def datapipe_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sign_bits = None
    for d in range(6):
        bit = (F.element_at(F.col("embedding"), d + 1) > 0).cast("int")
        term = bit * (2 ** (5 - d))
        sign_bits = term if sign_bits is None else sign_bits + term
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", sign_bits.alias("bucket")
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clustered = e.join(docs, e.vec_id == docs.doc_id)
    w = Window.partitionBy("bucket").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        clustered.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "bucket_size",
            F.count(F.lit(1)).over(Window.partitionBy("bucket")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "bucket",
            F.col("doc_id").alias("survivor_doc_id"),
            "n_chars",
            F.col("bucket_size").cast("long").alias("bucket_size"),
        )
    )


# --------------------------------------------------------------------
# Scalar Arrow UDF (Spark 4 `arrow_udf`): the newest rung of the UDF
# ladder — scalar call signature like pandas_udf, but the batch is a
# raw pyarrow.Array and the body runs pyarrow.compute kernels with no
# pandas conversion either side. Exact integer outputs, plain SQL
# oracle. (mapInArrow covers the iterator form; this is the
# expression-position form.)
# --------------------------------------------------------------------
@query(
    "datapipe_arrow_udf_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(text) AS BIGINT) AS n_chars_utf8
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def datapipe_arrow_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDFs live in functions.udafs: arrow_udf dispatches on REAL type
    # hints, which this module's `from __future__ import annotations`
    # would stringify (same PEP-563 trap as pandas_udf)
    from ..functions.udafs import arrow_n_chars, arrow_n_tokens

    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id",
            arrow_n_tokens("text").alias("n_tokens"),
            arrow_n_chars("text").alias("n_chars_utf8"),
        )
    )


# --------------------------------------------------------------------
# Pretraining-corpus assembly capstone: the full pipeline as ONE
# declarative plan — quality gate -> PII scrub -> exact dedup on
# scrubbed content -> benchmark decontamination (5-gram overlap,
# which also removes the benchmark docs themselves) -> per-source
# hash-threshold mixture -> per-source yield accounting. Every stage
# is an operator this module already proves in isolation; the
# capstone proves they COMPOSE into one Catalyst plan (each stage is
# a projection/group-by/semi-join — no collect between stages, no
# materialization barriers), which is how the pipeline actually runs
# over 100 TB: one submission, full pushdown across stages.
# --------------------------------------------------------------------
@query(
    "datapipe_pretrain_assembly",
    oracle=f"""
    WITH quality AS (
        SELECT doc_id, source,
               regexp_replace(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
        FROM documents
        WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
    ),
    dedup AS (
        SELECT * FROM quality
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY sha256(scrubbed) ORDER BY doc_id) = 1
    ),
    bench AS (
        SELECT DISTINCT unnest([array_to_string(toks[i:i+4], ' ')
                                FOR i IN range(1, greatest(len(toks) - 3, 1))])
                   AS shingle
        FROM (SELECT string_split(text, ' ') AS toks
              FROM documents WHERE doc_id < 5)
        WHERE len(toks) >= 5
    ),
    corpus_shingles AS (
        SELECT doc_id, unnest([array_to_string(toks[i:i+4], ' ')
                               FOR i IN range(1, greatest(len(toks) - 3, 1))])
                   AS shingle
        FROM (SELECT doc_id, string_split(scrubbed, ' ') AS toks FROM dedup)
    ),
    contaminated AS (
        SELECT DISTINCT c.doc_id
        FROM corpus_shingles c JOIN bench USING (shingle)
    ),
    final AS (
        SELECT d.doc_id, d.source, d.scrubbed FROM dedup d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
          AND substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
              < (CASE WHEN d.source = 'src0' THEN '8'
                      WHEN d.source = 'src1' THEN '4' ELSE '2' END)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(scrubbed, ' '))) AS BIGINT)
               AS n_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM final GROUP BY source
    """,
)
def datapipe_pretrain_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    quality = docs.filter(
        F.size(F.split("text", " ")).between(10, 1000)
    ).select(
        "doc_id",
        "source",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("scrubbed"),
    )
    w = Window.partitionBy(F.sha2("scrubbed", 256)).orderBy("doc_id")
    dedup = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    bench = (
        docs.filter(
            (F.col("doc_id") < 5) & (F.size(F.split("text", " ")) >= 5)
        )
        .select(F.explode(ngram_shingles("text", 5)).alias("shingle"))
        .distinct()
    )
    corpus_shingles = dedup.select(
        "doc_id", F.explode(ngram_shingles("scrubbed", 5)).alias("shingle")
    )
    contaminated = (
        corpus_shingles.join(F.broadcast(bench), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    thresh = (
        F.when(F.col("source") == "src0", F.lit("8"))
        .when(F.col("source") == "src1", F.lit("4"))
        .otherwise(F.lit("2"))
    )
    # shuffle_hash hint: contaminated is a doc-id set with no
    # structural bound (worst case the whole corpus matches the
    # benchmark) — the anti join must not broadcast-build on it
    final = dedup.join(
        contaminated.hint("shuffle_hash"), "doc_id", "left_anti"
    ).filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < thresh
    )
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("scrubbed", " ")).cast("long")).alias(
            "n_tokens"
        ),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# --------------------------------------------------------------------
# Shingle CONTAINMENT (asymmetric near-dup): |A∩B| / |A| instead of
# Jaccard — detects that doc A is QUOTED/EMBEDDED inside doc B even
# when B is much larger (Jaccard would dilute toward 0). The quote/
# subset detector the dedup family needs alongside symmetric
# similarity; same bounded-candidate discipline as
# datapipe_ngram_jaccard (pairwise only ever on a candidate set).
# Exact integer intersection and size; one final division.
# --------------------------------------------------------------------
@query(
    "datapipe_shingle_containment",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   FOR i IN range(1, greatest(len(toks) - 1, 1))
               ]) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id < 12)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT)
               AS n_common,
           CAST(len(a.shingles) AS BIGINT) AS n_a,
           len(list_intersect(a.shingles, b.shingles)) * 1.0
               / len(a.shingles) AS containment_a_in_b
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE len(a.shingles) > 0
    """,
)
def datapipe_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 12)
        .select(
            "doc_id",
            F.array_distinct(ngram_shingles("text", 3)).alias("shingles"),
        )
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(
        F.array_intersect(F.col("a.shingles"), F.col("b.shingles"))
    )
    n_a = F.size(F.col("a.shingles"))
    return (
        a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .filter(n_a > 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.cast("long").alias("n_common"),
            n_a.cast("long").alias("n_a"),
            (inter * 1.0 / n_a).alias("containment_a_in_b"),
        )
    )

# --------------------------------------------------------------------
# BM25 ranking: score every document against a fixed query-term set
# (Okapi BM25, Lucene IDF variant). Complements TF-IDF top terms
# above: TF-IDF ranks terms within a doc, BM25 ranks docs for a
# query — the retrieval primitive a RAG/dedup pipeline runs before
# the embedding stage.
#
# Scale design: the term-filter lands BEFORE the tf group-by, so the
# shuffled key space is |query_terms| x docs-containing-a-term, not
# the full token stream; df/avgdl/N are tiny aggregates broadcast as
# 1-row/|Q|-row frames. One O(tokens) map pass + two small shuffles —
# the same plan at 100 TB. All counts exact-integer; only the final
# score is floating point, rounded to 6dp on both engines.
# --------------------------------------------------------------------
BM25_TERMS = ("merge", "stream", "hash")
BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "datapipe_bm25_rank",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl * 1.0) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
        WHERE tok IN ('merge', 'stream', 'hash')
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok
    ),
    scored AS (
        SELECT tf.doc_id,
               SUM(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * tf * ({BM25_K1} + 1.0)
                   / (tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))
               ) AS bm25
        FROM tf
        JOIN df USING (tok)
        JOIN dl USING (doc_id), stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(bm25, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def datapipe_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 over the whitespace token stream.

    Reference scope: the reference has no retrieval; this is the
    beyond-reference text-analysis family (SURVEY §2.14). IDF is the
    Lucene ``ln((N - df + 0.5)/(df + 0.5) + 1)`` form (always
    positive), k1=1.2, b=0.75.
    """
    from ..operators.staging import stage_boundary

    docs = load(spark, sf_dir, "documents", fan_out_by=("doc_id",)).select(
        "doc_id", tokens("text").alias("toks")
    )
    # dl (two longs per doc) and tf (docs x |Q| query terms) are the
    # two shared frames; staged, the plan tokenizes the corpus twice
    # (their fills) instead of four times (stats + df_ + both final
    # join sides)
    dl = stage_boundary(
        docs.select("doc_id", F.size("toks").cast("long").alias("dl")),
        materialize=False,
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl") * 1.0).alias("avgdl"),
    )  # 1-row, broadcast
    tf = stage_boundary(
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf")),
        materialize=False,
    )
    df_ = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )  # |Q| rows, broadcast
    term_score = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------
# Unigram language-model quality score (CCNet-style perplexity
# filter): score each document by the mean log-probability of its
# tokens under the corpus's own unigram distribution. Low scorers
# are boilerplate/garbage; the canonical pretraining-curation filter
# after the heuristic gates (datapipe_quality_classifier) and before
# embedding-based dedup.
#
# Scale design: the unigram table is a groupBy(tok) — O(vocab)
# shuffle with map-side combine; the doc join is an equi-join on tok
# that carries an explicit shuffle_hash hint (round 10: the static
# planner broadcast this vocab aggregate at sf1 from its post-explode
# underestimate and the eager build OOM'd; AQE can only UPGRADE a
# shuffle to broadcast from runtime stats, never demote a static
# broadcast, so the safe direction is hint-shuffle and let AQE
# promote when the vocab genuinely fits). No Python, no global sort;
# perplexity threshold applies as a post-agg filter.
# --------------------------------------------------------------------
@query(
    "datapipe_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok
    ),
    tot AS (SELECT SUM(freq) AS t FROM freq)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(ln(freq * 1.0 / t)), 6) AS avg_logprob
    FROM toks JOIN freq USING (tok), tot
    GROUP BY doc_id
    ORDER BY avg_logprob, doc_id
    LIMIT 20
    """,
)
def datapipe_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 lowest-scoring documents under the corpus unigram LM
    (ascending mean token log-probability — the doc the filter
    would drop first). AVG of per-token doubles is rounded to 6dp on
    both engines; token and total counts are exact integers.
    """
    from ..operators.staging import stage_boundary

    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
    )
    # O(vocab) boundary (the DSIR pattern): freq feeds the total and
    # the scoring join; staged, the corpus tokenizes twice, not three
    # times
    freq = stage_boundary(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq")),
        materialize=False,
    )
    tot = freq.agg(F.sum("freq").alias("t"))  # 1-row, broadcast
    return (
        # shuffle_hash hint: freq is keyed by the token VOCABULARY —
        # the static planner broadcast this aggregate at sf1 from its
        # post-explode underestimate (the eager-broadcast-build trap;
        # AQE cannot demote a static broadcast, only upgrade a shuffle)
        toks.join(freq.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("freq") * 1.0 / F.col("t"))), 6
            ).alias("avg_logprob"),
        )
        .orderBy("avg_logprob", "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------
# Incremental NEAR-dup: dedup an arriving batch against the existing
# corpus via LSH bucket collisions — the continuous-ingest complement
# to datapipe_incremental_dedup (exact) and datapipe_neardup_clusters
# (full-corpus). The batch is docs with doc_id % 10 = 0 (a stable
# ~10% slice at every SF); the corpus is everything else.
#
# The scale property this shape buys: the corpus NEVER joins itself.
# Band keys are computed for both sides (a production run loads the
# corpus side from the persisted signature index instead of
# recomputing — see save_ann_index_artifact for the pattern), the
# join is new-bands x old-bands on the short band key, and pairwise
# verification (exact token Jaccard) runs only for each new doc
# against its MIN colliding partner — O(batch) verifications, not
# O(batch x corpus).
# --------------------------------------------------------------------
@query(
    "datapipe_incremental_neardup",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    nb AS (SELECT * FROM bands WHERE doc_id % 10 = 0),
    ob AS (SELECT * FROM bands WHERE doc_id % 10 <> 0),
    cand AS (
        SELECT nb.doc_id AS doc_id,
               CAST(MIN(ob.doc_id) AS BIGINT) AS partner_id,
               CAST(COUNT(DISTINCT ob.doc_id) AS BIGINT) AS n_old_partners
        FROM nb JOIN ob USING (band_id, band_key)
        GROUP BY nb.doc_id
    ),
    toks AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
        FROM documents
    )
    SELECT doc_id, partner_id, n_old_partners,
           len(list_intersect(a.ts, b.ts)) * 1.0
               / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
               AS jaccard
    FROM cand c
    JOIN toks a USING (doc_id)
    JOIN toks b ON b.doc_id = c.partner_id
    """,
)
def datapipe_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # the banded-signature frame feeds BOTH join sides (new batch +
    # old corpus). Catalyst does not materialize common subplans, so
    # unstaged the tokenize + 4×md5 MinHash pipeline ran TWICE — the
    # round-13 scan sweep counted documents 4× in this one plan (2×
    # bands + 2× token arrays below). Staged, each is computed once:
    # at 100 TB that is two corpus passes instead of four (guide §2.4).
    bands = stage_boundary(
        _bands(_signatures(spark, sf_dir)), materialize=False
    )
    is_new = F.col("doc_id") % 10 == 0
    nb = bands.filter(is_new).withColumnRenamed("doc_id", "new_id")
    ob = bands.filter(~is_new).withColumnRenamed("doc_id", "old_id")
    # shuffle_hash hint: ob is the banded OLD corpus — the side that
    # accumulates forever in incremental dedup — yet the static
    # planner broadcast it at sf1 from its post-band-explode
    # underestimate (round-11 audit catch after the SortAggregate
    # key= regex fix). Hint-shuffle keeps the index side
    # AQE-upgradable when it genuinely fits; rows are narrow.
    cand = (
        nb.join(ob.hint("shuffle_hash"), ["band_id", "band_key"])
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(
            F.min("old_id").cast("long").alias("partner_id"),
            F.countDistinct("old_id").cast("long").alias("n_old_partners"),
        )
    )
    toks = stage_boundary(
        load(spark, sf_dir, "documents", fan_out_by=("doc_id",)).select(
            "doc_id", F.array_distinct(tokens("text")).alias("ts")
        ),
        materialize=False,
    )
    a = toks.withColumnRenamed("ts", "ts_a")
    b = toks.select(
        F.col("doc_id").alias("partner_id"), F.col("ts").alias("ts_b")
    )
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    return (
        cand.join(a, "doc_id")
        .join(b, "partner_id")
        .select(
            "doc_id",
            "partner_id",
            "n_old_partners",
            (
                inter * 1.0
                / (F.size("ts_a") + F.size("ts_b") - inter)
            ).alias("jaccard"),
        )
    )


# ====================================================================
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): score every doc by
# how target-like it is under two smoothed unigram LMs — the target
# slice (lang = 'en') vs the raw corpus. Score = mean over the doc's
# tokens of log(p_target(tok) / p_raw(tok)), add-one smoothing over
# the shared vocabulary.
#
# Scale shape: one explode + one token group-by computes BOTH counts
# (map-side combinable), totals are a 1-row broadcast, the per-doc
# score is a second group-by on doc_id. O(total tokens) with two
# shuffles, no pair joins, no UDF — the same shape DSIR runs at
# Pile scale.
# ====================================================================
@query(
    "datapipe_dsir_importance",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT tok,
               COUNT(*) AS c_raw,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_tgt
        FROM toks GROUP BY tok
    ),
    tot AS (
        SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
               CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
               COUNT(*) AS v
        FROM freq
    ),
    scored AS (
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               ROUND(AVG(ln((c_tgt + 1.0) / (n_tgt + v))
                         - ln((c_raw + 1.0) / (n_raw + v))), 6)
                   AS dsir_score
        FROM toks JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY doc_id
    )
    SELECT s.doc_id, d.lang, n_tokens, dsir_score
    FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ORDER BY dsir_score DESC, s.doc_id LIMIT 20
    """,
)
def datapipe_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most target-like docs under the DSIR importance score
    (lang='en' as the target distribution)."""
    return (
        _dsir_scored(spark, sf_dir)
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(20)
        .select("doc_id", "lang", "n_tokens", "dsir_score")
    )


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc with its DSIR importance score (no ranking cut) —
    the frame the resampling step would hash-threshold over."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("tok")
    )
    from ..operators.staging import stage_boundary

    # O(vocab) boundary: freq feeds the totals and the scoring join;
    # unstaged, each consumer re-tokenizes the corpus. The token
    # stream itself (toks) stays unstaged on purpose — it is
    # corpus-sized, and two tokenize passes beat materializing it.
    freq = stage_boundary(
        toks.groupBy("tok").agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
                "c_tgt"
            ),
        ),
        materialize=False,
    )
    tot = freq.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    logratio = F.log(
        (F.col("c_tgt") + 1.0) / (F.col("n_tgt") + F.col("v"))
    ) - F.log((F.col("c_raw") + 1.0) / (F.col("n_raw") + F.col("v")))
    scored = (
        # shuffle_hash hint: freq is keyed by the token VOCABULARY —
        # the static planner broadcast this aggregate at sf1 from its
        # post-explode underestimate (the eager-broadcast-build trap;
        # AQE cannot demote a static broadcast, only upgrade a shuffle)
        toks.join(freq.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(logratio), 6).alias("dsir_score"),
        )
    )
    return scored.join(docs.select("doc_id", "lang"), "doc_id")


# ====================================================================
# Bloom-filter membership dedup — the streaming-ingest scale path for
# exact dedup. The corpus (doc_id % 10 <> 0) is folded into an
# explicit Bloom filter: K=4 arithmetic hash positions per content
# fingerprint over an M = 2^20 bit space, materialized as a DISTINCT
# position table. An arriving batch (doc_id % 10 = 0) probes it: a
# doc is flagged iff ALL its positions are set.
#
# Why this instead of Spark's built-in bloom_filter_agg: the
# arithmetic construction is engine-portable, so the whole filter —
# including its false-positive behavior — is DuckDB-oracle-checked
# exactly, not just bounded. The no-false-negative guarantee (every
# true duplicate is flagged) is structural: a corpus fingerprint sets
# exactly the positions its batch twin probes.
#
# Scale: the position table is bounded by M (~1M rows) REGARDLESS of
# corpus size — it broadcasts forever, so the probe is a map-side
# join of the batch alone. The true-dup audit column joins batch
# fingerprints against corpus fingerprints (shuffle, O(corpus)); a
# production ingest drops that column and keeps only the O(M) probe.
# ====================================================================
_BLOOM_M = 1 << 20
_BLOOM_HASHES = ((31, 7), (37, 11), (61, 13), (89, 17))
_FP_EXPR = (
    "aggregate("
    "  transform(split(text, ' '), (t, i) ->"
    "    CAST((i + 1) * (length(t) * 31 + ascii(substring(t, 1, 1)))"
    "         AS BIGINT)),"
    "  CAST(0 AS BIGINT), (acc, x) -> acc + x"
    ") % 1000000007"
)
_FP_SQL = """
    CAST(list_sum([
        i * (length(toks[i]) * 31 + ascii(substring(toks[i], 1, 1)))
        for i in range(1, len(toks) + 1)
    ]) % 1000000007 AS BIGINT)
"""
_POS_SQL = ", ".join(
    f"(fp * {a} + {b}) % {_BLOOM_M}" for a, b in _BLOOM_HASHES
)


@query(
    "datapipe_bloom_dedup",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, {_FP_SQL} AS fp
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
    ),
    corpus AS (SELECT * FROM fp WHERE doc_id % 10 <> 0),
    batch AS (SELECT * FROM fp WHERE doc_id % 10 = 0),
    bloom AS (
        SELECT DISTINCT unnest([{_POS_SQL}]) AS pos FROM corpus
    ),
    probe AS (
        SELECT doc_id, fp,
               unnest(list_distinct([{_POS_SQL}])) AS pos
        FROM batch
    ),
    agg AS (
        SELECT p.doc_id, p.fp,
               COUNT(*) AS n_probe,
               CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit
        FROM probe p LEFT JOIN bloom b ON p.pos = b.pos
        GROUP BY p.doc_id, p.fp
    )
    SELECT a.doc_id,
           CAST(n_hit = n_probe AS INTEGER) AS bloom_hit,
           -- NULL-fp corpus rows (NULL text) match nothing; without
           -- the filter SQL's three-valued IN returns NULL, not 0
           CAST(a.fp IN (SELECT fp FROM corpus WHERE fp IS NOT NULL)
                AS INTEGER) AS true_dup
    FROM agg a
    """,
)
def datapipe_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # the fingerprint frame feeds THREE branches (bloom build, probe,
    # true-dup lookup) — unstaged, the per-token aggregate-hash ran
    # three times (round-13 scan sweep: documents x3). Staged, one
    # corpus pass computes every fingerprint (guide §2.4); the frame
    # is two longs per doc.
    docs = stage_boundary(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.expr(_FP_EXPR).alias("fp")
        ),
        materialize=False,
    )
    is_batch = F.col("doc_id") % 10 == 0
    corpus = docs.filter(~is_batch)
    batch = docs.filter(is_batch)
    positions = F.array(
        *[
            (F.col("fp") * a + b) % _BLOOM_M
            for a, b in _BLOOM_HASHES
        ]
    )
    bloom = (
        corpus.select(F.explode(positions).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe = batch.select(
        "doc_id",
        "fp",
        F.explode(F.array_distinct(positions)).alias("pos"),
    )
    agg = (
        probe.join(F.broadcast(bloom), "pos", "left")
        .groupBy("doc_id", "fp")
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    corp_fps = corpus.select("fp").distinct().withColumn("td", F.lit(1))
    return (
        # shuffle_hash hint: corp_fps is every distinct corpus
        # fingerprint (the bloom POSITION table is M-bounded and stays
        # broadcast; this frame is not)
        agg.join(corp_fps.hint("shuffle_hash"), "fp", "left")
        .select(
            "doc_id",
            (F.col("n_hit") == F.col("n_probe"))
            .cast("int")
            .alias("bloom_hit"),
            F.coalesce(F.col("td"), F.lit(0)).cast("int").alias("true_dup"),
        )
    )


# ====================================================================
# Cross-corpus n-gram novelty: for every doc, the fraction of its
# DISTINCT 5-gram shingles that also occur in at least one OTHER doc
# (the "burned n-gram" ratio used to rank near-duplicated / boilerplate
# documents for removal). Complements datapipe_shingle_containment
# (pairwise, bounded pair set): this is corpus-global with NO pair
# join — gram -> distinct-doc-count group-by, join back, per-doc
# ratio. O(total shingles) with map-side combine.
# ====================================================================
@query(
    "datapipe_ngram_novelty",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       || ' ' || toks[i+3] || ' ' || toks[i+4]
                   FOR i IN range(1, greatest(len(toks) - 3, 1))
               ])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
        WHERE len(toks) >= 5
    ),
    gd AS (
        SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY gram
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS dup_ratio
    FROM sh JOIN gd USING (gram)
    GROUP BY doc_id
    ORDER BY dup_ratio DESC, doc_id LIMIT 20
    """,
)
def datapipe_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-duplicated docs by shared-5-gram ratio."""
    sh = (
        load(spark, sf_dir, "documents")
        .filter(F.size(tokens("text")) >= 5)
        .select(
            "doc_id",
            F.explode(F.array_distinct(ngram_shingles("text", 5))).alias(
                "gram"
            ),
        )
    )
    # Round 14, examined and reverted: staging the exploded gram
    # frame (so the document-frequency aggregate and the join-back
    # share one pass) A/B'd 0.87x at sf0.1, and at 100 TB the persist
    # is WORSE than the rescan by construction — the exploded 5-gram
    # frame is several times the corpus bytes, so caching it trades a
    # column-pruned parquet re-read for a larger decompressed write.
    # The docs x2 is the right plan at every scale here.
    gd = sh.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        # shuffle_hash hint: gd is keyed by the 5-GRAM VOCABULARY —
        # corpus-scale, and Catalyst's post-explode estimate picked a
        # static broadcast that measured 348 MB at sf1 (spilled; dies
        # a decade later). The vocab shard per partition stays thin.
        sh.join(gd.hint("shuffle_hash"), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            shared.alias("n_shared"),
            F.round(shared * 1.0 / F.count(F.lit(1)), 6).alias("dup_ratio"),
        )
        .orderBy(F.desc("dup_ratio"), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------
# Tokenizer induction, step 1 of BPE training: adjacent-symbol pair
# frequencies. [beyond-reference] — the reference has no text pipeline
# at all; this is the aggregation a BPE/WordPiece trainer repeats each
# merge round (Sennrich et al. 2016).
#
# Scale design: the pair count is computed over the WORD VOCABULARY
# weighted by corpus frequency — the standard trainer trick — so the
# expensive explode runs over |vocab| rows, not |corpus| rows. The
# corpus-side work is a single map-side-combinable word count; at
# 100 TB the vocabulary frame that feeds the character-pair explode is
# millions of rows, not trillions. Everything is built-in JVM
# expressions (split/explode/transform/substring) — no Python worker.
# --------------------------------------------------------------------
@query(
    "datapipe_bpe_pair_counts",
    oracle="""
    WITH vocab AS (
        SELECT word, COUNT(*) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE length(word) >= 2
        GROUP BY word
    ),
    positions AS (
        SELECT word, wc,
               unnest(generate_series(1, length(word) - 1)) AS i
        FROM vocab
    )
    SELECT substring(word, CAST(i AS INT), 2) AS pair,
           CAST(SUM(wc) AS BIGINT) AS pair_count
    FROM positions
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 50
    """,
)
def datapipe_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character pairs by corpus-weighted frequency."""
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(50)
    )


# --------------------------------------------------------------------
# Tokenizer vocabulary coverage / OOV rate. [beyond-reference] Given
# a candidate vocabulary (the top-k corpus tokens), what fraction of
# token OCCURRENCES falls outside it? The go/no-go metric for sizing
# a tokenizer before a pretrain run.
#
# Scale design: one map-side-combinable token count over the corpus;
# the vocabulary is a TakeOrderedAndProject top-k (never a global
# sort) and rejoins as a broadcast left-semi; totals are 1-row
# aggregates combined with a broadcast cross join. Integer counts
# until the single final division.
# --------------------------------------------------------------------
_VOCAB_K = 16


@query(
    "datapipe_vocab_coverage",
    oracle=f"""
    WITH counts AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
    ),
    vocab AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT {_VOCAB_K}),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM counts),
    cov AS (
        SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_covered
        FROM counts WHERE tok IN (SELECT tok FROM vocab)
    )
    SELECT n_tokens, n_covered,
           ROUND((n_tokens - n_covered) * 1.0 / n_tokens, 6) AS oov_rate
    FROM tot, cov
    """,
)
def datapipe_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV rate of the top-16-token vocabulary over the corpus."""
    from ..operators.staging import stage_boundary

    # O(vocab) boundary: counts feeds the vocab cut, the token total,
    # and the coverage semi-join — staged, one tokenize pass instead
    # of three
    counts = stage_boundary(
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c")),
        materialize=False,
    )
    vocab = counts.orderBy(F.desc("c"), "tok").limit(_VOCAB_K).select("tok")
    tot = counts.agg(F.sum("c").alias("n_tokens"))
    cov = counts.join(F.broadcast(vocab), "tok", "left_semi").agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_covered")
    )
    return tot.crossJoin(F.broadcast(cov)).select(
        "n_tokens",
        "n_covered",
        F.round(
            (F.col("n_tokens") - F.col("n_covered"))
            * 1.0
            / F.col("n_tokens"),
            6,
        ).alias("oov_rate"),
    )


# --------------------------------------------------------------------
# PNG transcode: the format-normalization pass of a multimodal ingest
# pipeline (everything → one canonical container). [beyond-reference]
# PNG is the one compressed container the stdlib covers end-to-end
# (DEFLATE = zlib, CRC-checked chunks) — see
# functions/multimodal.py:encode_png/decode_png. The query decodes
# the BMP/PPM payload, re-encodes as PNG, decodes THAT back and emits
# the round-tripped pixel stats; the oracle recomputes them
# closed-form from the generator's byte rule, so a bug anywhere in
# the three codec passes breaks the hash. Same scale shape as
# datapipe_multimodal_decode: chained Arrow map stages, no shuffle,
# no driver-side blobs.
# --------------------------------------------------------------------
@query(
    "datapipe_png_transcode",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 8 AS INTEGER) AS width,
           CAST(3 + doc_id % 5 AS INTEGER) AS height,
           CAST((4 + doc_id % 8) * (3 + doc_id % 5) AS BIGINT) AS n_pixels,
           CAST(list_sum(list_transform(
                    range(0, (4 + doc_id % 8) * (3 + doc_id % 5) * 3),
                    i -> (doc_id * 31 + i) % 256)) AS BIGINT)
               AS pixel_byte_sum,
           CAST(doc_id * 31 % 256 AS INTEGER) AS top_left_r,
           CAST((doc_id * 31
                 + (4 + doc_id % 8) * (3 + doc_id % 5) * 3 - 1) % 256
                AS INTEGER) AS bottom_right_b
    FROM documents
    """,
)
def datapipe_png_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "documents").select("doc_id")
    return transcode_png_meta(synth_image_payloads(df))


# --------------------------------------------------------------------
# Exact set-similarity join via PPJoin-style prefix filtering
# (Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008 PPJoin).
# [beyond-reference] The EXACT complement to the MinHash/LSH family
# above: every pair with 3-gram-shingle Jaccard >= 0.9, no
# approximation, and still no all-pairs join.
#
# The filter: order each doc's shingle set by GLOBAL rarity
# (rarest first; any shared total order is correct, frequency order
# is what makes prefixes selective), keep only the first
# p = |S| - ceil(tau*|S|) + 1 shingles as the doc's "prefix". If
# J(A,B) >= tau, the globally-smallest common shingle provably sits
# in BOTH prefixes (at most |S| - ceil(tau*|S|) non-common shingles
# can precede it on either side), so joining prefix-to-prefix loses
# nothing; exact Jaccard then verifies the survivors.
#
# Scale design: shingle frequencies are an equi-shuffle groupBy (no
# broadcast of corpus-sized state); the candidate join keys on single
# rare shingles, so its fan-out is sum-of-squares of PREFIX-shingle
# document frequencies — the rarity ordering is exactly what keeps
# those tiny. Verification joins are equi-joins on doc_id. All four
# joins here have unbounded sides, so each carries an explicit
# shuffle hint: Catalyst's size estimate for these frames (explode +
# collect_list aggregates, cold-cache InMemoryRelations) comes out
# small enough to statically pick BroadcastHashJoin, and a wrong
# static broadcast executes eagerly and OOMs before AQE can demote
# it — the round-10 sf1 rotation measured a 348 MB broadcast build
# dying in a 1 GB session exactly this way. Strategy per join:
# hint("shuffle_hash") ONLY for the freq join — its build side is a
# vocab shard whose per-partition size shrinks as partitions grow,
# and SHJ skips sorting the exploded corpus stream; hint("merge")
# everywhere a joined side carries the per-doc shingle ARRAYS (the
# prefix join and both verifies): the round-10 sf1 A/B put
# shuffle_hash on the verify side and its hash build died with
# "Can't acquire 536 MB to build hash relation" — the candidate
# frame is answer-bounded in ROWS but each row drags a full shingle
# array, and SHJ builds don't spill where SMJ sorts do. (Same
# contract as datapipe_unigram_logprob, whose vocab join is now
# explicitly shuffle_hash-hinted for the same reason: a static
# broadcast cannot be AQE-demoted, so scaling-key aggregate
# join-backs hint shuffle and let AQE upgrade from runtime stats.)
# Threshold compare is cross-multiplied integers (10*inter >= 9*uni):
# no float epsilon on the decision boundary. The oracle brute-forces
# all pairs — feasible only at fixture scale, which is the point:
# same answer, quadratic vs near-linear candidate space.
#
# The rarity-ordered shingle frame feeds three consumers (prefix
# explode + both verification sides). Catalyst does not
# materialize common subplans, so without a boundary the physical
# plan contains the shingle + frequency-join subtree 3x and the
# document scan ~6x (visible in explain()). stage_boundary
# (persist MEMORY_AND_DISK, lazy: the single no-op-sink action
# fills the cache on first touch, the other branches read blocks)
# computes it once; stage_boundary's bounded LRU unpersists the
# oldest staged cache past its cap (Spark's ContextCleaner does NOT
# free SQL cache entries), so repeated calls don't leak storage. At
# local
# fixture scale the redundant subtree is cheap enough that this is
# near-neutral on wall clock; at 100 TB — where the shingle
# explode dominates — compute-once is the difference between one
# corpus pass and three. There, prefer writing the frame once as a
# bucketed table keyed on doc_id so the verification joins are
# also exchange-free.
# --------------------------------------------------------------------
@query(
    "datapipe_jaccard_prefix_join",
    oracle="""
    WITH sh AS (
        SELECT doc_id, list_distinct([
            toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in range(1, greatest(len(toks) - 1, 1))
        ]) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
    ),
    d AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) >= 1),
    p AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(len(list_intersect(a.shingles, b.shingles))
                    AS BIGINT) AS inter,
               CAST(len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))
                    AS BIGINT) AS uni
        FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT da, db, inter, uni,
           ROUND(inter * 1.0 / uni, 6) AS jaccard
    FROM p WHERE 10 * inter >= 9 * uni
    """,
)
def datapipe_jaccard_prefix_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.staging import stage_boundary

    sh = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.array_distinct(ngram_shingles("text", 3)).alias("shingles"),
        )
        .filter(F.size("shingles") >= 1)
    )
    freq = (
        sh.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ordered = (
        sh.select("doc_id", F.explode("shingles").alias("shingle"))
        .join(freq.hint("shuffle_hash"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(freq, shingle))),"
                " x -> x.shingle)"
            ).alias("toks")
        )
        .select("doc_id", "toks", F.size("toks").alias("s"))
    )
    ordered = stage_boundary(ordered, materialize=False)
    # prefix length for tau = 9/10, in exact integer arithmetic:
    # p = s - ceil(9s/10) + 1
    prefixes = ordered.select(
        "doc_id",
        "toks",
        "s",
        F.explode(
            # ceil(9s/10) = (9s + 9) div 10, pure integer arithmetic
            F.slice("toks", F.lit(1), F.expr("s - (9*s + 9) div 10 + 1"))
        ).alias("tok"),
    )
    a = prefixes.select(
        F.col("doc_id").alias("da"), F.col("tok").alias("tok")
    )
    b = prefixes.select(
        F.col("doc_id").alias("db"), F.col("tok").alias("tok")
    )
    cands = (
        a.join(b.hint("merge"), "tok")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    da = ordered.select(
        F.col("doc_id").alias("da"),
        F.col("toks").alias("toks_a"),
        F.col("s").alias("sa"),
    )
    db_ = ordered.select(
        F.col("doc_id").alias("db"),
        F.col("toks").alias("toks_b"),
        F.col("s").alias("sb"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    verified = (
        cands.join(da.hint("merge"), "da")
        .join(db_.hint("merge"), "db")
        .select(
            "da",
            "db",
            inter.alias("inter"),
            (F.col("sa") + F.col("sb") - inter).cast("long").alias("uni"),
        )
        .filter(10 * F.col("inter") >= 9 * F.col("uni"))
    )
    return verified.select(
        "da",
        "db",
        "inter",
        "uni",
        F.round(F.col("inter") * 1.0 / F.col("uni"), 6).alias("jaccard"),
    )


# --------------------------------------------------------------------
# Web-corpus domain curation: every large-scale crawl pipeline
# (C4/RefinedWeb/FineWeb style) starts by parsing URLs, aggregating
# per-domain quality signals, and dropping blocklisted hosts. The URL
# column is synthesized deterministically from doc fields (the fixture
# has no real crawl URLs), then PARSED back with Spark's parse_url —
# host, path segment, and a query-string parameter all come from the
# parser, and the DuckDB oracle re-derives the same pieces with
# regexes over the identically-constructed string, so a parse_url
# semantics mistake breaks the hash. The blocklist is a broadcast
# anti-join (|blocklist| rows — the realistic shape: blocklists are
# tiny vs the corpus). Scale: URL build + parse are pure map work
# fused into the scan stage; the only shuffle is the per-host
# aggregation, map-side-combinable, O(distinct hosts) output.
# [beyond-reference] web curation; reference has no URL surface.
# --------------------------------------------------------------------
@query(
    "datapipe_url_domain_curation",
    oracle="""
    WITH u AS (
        SELECT doc_id, lang, n_chars,
               'https://' || source || '-' || CAST(doc_id % 3 AS VARCHAR)
                 || '.example.com/' || lang || '/doc-'
                 || CAST(doc_id AS VARCHAR) || '.html?q='
                 || CAST(n_chars AS VARCHAR) || '&p='
                 || CAST(doc_id % 7 AS VARCHAR) AS url
        FROM documents
    ), p AS (
        SELECT doc_id,
               regexp_extract(url, 'https://([^/]+)/', 1) AS host,
               regexp_extract(url, 'https://[^/]+/([a-z]+)/', 1)
                   AS path_lang,
               CAST(regexp_extract(url, '[?&]q=([0-9]+)', 1) AS BIGINT)
                   AS q_chars
        FROM u
        -- a NULL source/lang/n_chars nulls the whole concat: no URL,
        -- not crawlable (Spark's NOT-IN-via-anti-join would otherwise
        -- KEEP the NULL host while SQL NOT IN drops it — both now
        -- exclude it explicitly)
        WHERE url IS NOT NULL
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT path_lang) AS BIGINT) AS n_langs
    FROM p
    WHERE host NOT IN ('src0-0.example.com', 'src2-1.example.com')
    GROUP BY host
    """,
)
def datapipe_url_domain_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("-"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".html?q="),
        F.col("n_chars").cast("string"),
        F.lit("&p="),
        (F.col("doc_id") % 7).cast("string"),
    )
    parsed = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.element_at(
            F.split(F.parse_url(url, F.lit("PATH")), "/"), 2
        ).alias("path_lang"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q"))
        .cast("long")
        .alias("q_chars"),
    ).filter(F.col("host").isNotNull())  # no URL -> not crawlable
    blocklist = spark.createDataFrame(
        [("src0-0.example.com",), ("src2-1.example.com",)], ["host"]
    )
    return (
        parsed.join(F.broadcast(blocklist), "host", "left_anti")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q_chars").alias("total_chars"),
            F.countDistinct("path_lang").alias("n_langs"),
        )
    )


# --------------------------------------------------------------------
# Perceptual-hash image dedup (aHash): the image-side twin of MinHash
# text dedup, and the standard first pass of LAION-style multimodal
# curation — decode, 4x4 average-hash, then group identical hashes
# into duplicate clusters. The hash is computed in the same Arrow map
# stage as the decode (pixels never cross a shuffle; only the 8-byte
# hash does), and the cluster stats are one window over the hash key —
# O(docs) shuffled bytes regardless of image size. The DuckDB oracle
# recomputes the full decode -> sample-grid -> threshold -> bit-pack
# pipeline closed-form from the synthesizer's byte rule, so a
# floor-mapping or bit-order mistake in either engine breaks the
# hash match. Near-dup (Hamming<=t) banding over these hashes is
# datapipe_hamming_neardup's shape; this query is the exact-bucket
# stage. [beyond-reference] multimodal curation.
# --------------------------------------------------------------------
@query(
    "datapipe_image_phash_dedup",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               list_transform(range(0, 16), k ->
                   list_sum(list_transform(range(0, 3), c ->
                       (doc_id * 31
                        + ((((k // 4) * (3 + doc_id % 5)) // 4)
                             * (4 + doc_id % 8)
                           + (((k % 4) * (4 + doc_id % 8)) // 4)) * 3
                        + c) % 256))) AS gs
        FROM documents
    ), ph AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 16), k ->
                   CASE WHEN gs[k + 1] * 16 > list_sum(gs)
                        THEN 1 << k ELSE 0 END)) AS BIGINT) AS phash
        FROM h
    )
    SELECT doc_id, phash,
           CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT)
               AS n_same_hash,
           CAST(MIN(doc_id) OVER (PARTITION BY phash) AS BIGINT)
               AS rep_doc_id
    FROM ph
    """,
)
def datapipe_image_phash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.multimodal import image_ahash_meta

    df = load(spark, sf_dir, "documents").select("doc_id")
    hashed = image_ahash_meta(synth_image_payloads(df))
    w = Window.partitionBy("phash")
    return hashed.select(
        "doc_id",
        "phash",
        F.count(F.lit(1)).over(w).alias("n_same_hash"),
        F.min("doc_id").over(w).alias("rep_doc_id"),
    )


# --------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (Achlioptas ±1 signs): the
# dimensionality-reduction pass that runs before ANN indexing or
# semantic dedup when 100 TB of embeddings won't fit the index —
# distances are preserved within (1±eps) while the vector shrinks
# 64 -> 8 dims. The sign matrix is derived from md5 at PLAN time
# (hashlib here == md5() in the oracle by construction) and unrolled
# into a pure JVM arithmetic expression — whole-stage-codegen'd,
# strictly left-to-right, each element cast to double first, so both
# engines produce bit-identical sums with NO rounding slack needed.
# Scale: zero shuffle — a map over the embedding column; the 512
# ±terms are compile-time constants, not a joined matrix.
# [beyond-reference] embedding infrastructure.
# --------------------------------------------------------------------
_RP_IN, _RP_OUT = 64, 8


def _rp_sign(i: int, j: int) -> int:
    import hashlib

    h = hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest()
    return 1 if h[0] < "8" else -1


def _rp_expr(j: int, elem: "str") -> str:
    """±chain for projected dim j; ``elem`` formats a 0-based index
    into the engine's element accessor."""
    parts = []
    for i in range(_RP_IN):
        op = "+" if _rp_sign(i, j) > 0 else "-"
        parts.append(f"{op} CAST({elem.format(i=i)} AS DOUBLE)")
    return "(0.0 " + " ".join(parts) + ")"


@query(
    "datapipe_random_projection",
    oracle="""
    SELECT vec_id, {projs}
    FROM embeddings
    """.format(
        projs=", ".join(
            f"ROUND({_rp_expr(j, 'embedding[{i} + 1]')}, 6) AS p{j}"
            for j in range(_RP_OUT)
        )
    ),
)
def datapipe_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        *[
            F.round(
                F.expr(_rp_expr(j, "embedding[{i}]")), 6
            ).alias(f"p{j}")
            for j in range(_RP_OUT)
        ],
    )


# --------------------------------------------------------------------
# PMI token co-occurrence — the classic corpus-statistics operator
# (word2vec-era association mining, collocation detection for
# tokenizer/vocab design). Pairs are generated MAP-SIDE with a nested
# array transform (window <= 3, unordered-canonicalized via
# least/greatest) — no per-doc window sort and no self-join on
# doc_id; the only shuffles are the two token/pair group-bys, both
# map-side-combinable. PMI arithmetic: integer counts to one double
# expression, multiplication order written identically in both
# engines. Top-20 by support is TakeOrderedAndProject.
# [beyond-reference] corpus statistics.
# --------------------------------------------------------------------
_PMI_WIN = 3
_PMI_MIN_C = 5


@query(
    "datapipe_pmi_cooccurrence",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    tok AS (
        SELECT unnest(toks) AS tok FROM t
    ),
    marg AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
    n_tok AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
    p0 AS (
        SELECT unnest(flatten([
            [{{'a': least(toks[CAST(i AS INT)], toks[CAST(i + k AS INT)]),
               'b': greatest(toks[CAST(i AS INT)], toks[CAST(i + k AS INT)])}}
             for k in range(1, least({_PMI_WIN}, len(toks) - i) + 1)]
            for i in range(1, len(toks))
        ])) AS s
        FROM t
    ),
    p AS (SELECT s['a'] AS tok_a, s['b'] AS tok_b FROM p0),
    pc AS (
        SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM p GROUP BY tok_a, tok_b
    ),
    n_pairs AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM p)
    SELECT pc.tok_a, pc.tok_b, pc.c_xy,
           ROUND(ln((CAST(pc.c_xy AS DOUBLE) * n_tok.n * n_tok.n)
                    / (CAST(n_pairs.np AS DOUBLE) * ma.c * mb.c)), 6)
               AS pmi
    FROM pc
    JOIN marg ma ON ma.tok = pc.tok_a
    JOIN marg mb ON mb.tok = pc.tok_b
    CROSS JOIN n_tok CROSS JOIN n_pairs
    WHERE pc.c_xy >= {_PMI_MIN_C}
    ORDER BY pc.c_xy DESC, pc.tok_a, pc.tok_b
    LIMIT 20
    """,
)
def datapipe_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # materialize the token array ONCE per row before the nested
    # transform — lambda bodies don't get common-subexpression
    # elimination, so an inline split(text) would re-tokenize per
    # (i, k) pair (measured 17s -> ~1s at sf0.1 for this query)
    pair_expr = f"""
    CASE WHEN size(toks) < 2 THEN
        CAST(array() AS array<struct<a string, b string>>)
    ELSE flatten(transform(sequence(1, size(toks) - 1), i ->
        transform(
            sequence(1, least({_PMI_WIN}, size(toks) - i)),
            k -> struct(
                least(element_at(toks, i),
                      element_at(toks, i + k)) AS a,
                greatest(element_at(toks, i),
                         element_at(toks, i + k)) AS b))))
    END
    """
    pairs = (
        docs.select(tokens("text").alias("toks"))
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
    )
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    marg = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    pc = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("c_xy")
    )
    # stage boundaries at the two aggregated frames (O(vocab) and
    # O(distinct pairs)): marg feeds three consumers (n_tok, both
    # marginal join sides) and pc two (n_pairs, the main join), so
    # the unstaged plan re-tokenizes the corpus five times
    from ..operators.staging import stage_boundary

    marg = stage_boundary(marg, materialize=False)
    pc = stage_boundary(pc, materialize=False)
    # totals come from the ALREADY-aggregated frames (O(vocab) /
    # O(pairs) rows), not a second scan of the corpus-sized inputs
    n_tok = marg.agg(F.sum("c").alias("n"))
    n_pairs = pc.agg(F.sum("c_xy").alias("np"))
    ma = marg.select(
        F.col("tok").alias("tok_a"), F.col("c").alias("c_a")
    )
    mb = marg.select(
        F.col("tok").alias("tok_b"), F.col("c").alias("c_b")
    )
    return (
        pc.filter(F.col("c_xy") >= _PMI_MIN_C)
        # shuffle_hash hints: the marginals are keyed by the token
        # VOCABULARY — corpus-scale, never statically broadcastable
        .join(ma.hint("shuffle_hash"), "tok_a")
        .join(mb.hint("shuffle_hash"), "tok_b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pairs))
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("n") * F.col("n"))
                    / (
                        F.col("np").cast("double")
                        * F.col("c_a")
                        * F.col("c_b")
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("c_xy"), "tok_a", "tok_b")
        .limit(20)
    )


# --------------------------------------------------------------------
# Nearest-centroid classification over embeddings — the E-step of
# distributed k-means and the cheapest serviceable label-propagation /
# cluster-assignment pass (semantic clustering, SemDeDup's assignment
# stage, few-shot centroid classifiers). Per-label centroids come
# from ONE map-side-combinable group-by over exploded (label, dim)
# cells — O(|labels|·dim) state; assignment joins each vector's dims
# against the BROADCAST centroid table (|labels|·dim rows), reduces
# to per-(vec, candidate) squared distances, and picks the argmin
# under the engine's rounded-rank-key contract (ROUND(d2, 9) with a
# label tie-break — the same cross-engine float-ordering discipline
# as the cosine top-k family). Output is the confusion matrix of
# true vs assigned label. Scale: explode is map-side (×dim), both
# group-bys are combinable, the window partitions by vec_id — no
# global sort, no all-pairs anything. [beyond-reference] embedding
# analytics.
# --------------------------------------------------------------------
@query(
    "datapipe_nearest_centroid",
    oracle="""
    WITH d AS (
        SELECT vec_id, label AS true_label, CAST(i AS INT) AS i,
               CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        FROM embeddings CROSS JOIN range(1, 65) r(i)
        WHERE embedding IS NOT NULL
    ),
    c AS (SELECT true_label AS label, i, AVG(v) AS c
          FROM d GROUP BY true_label, i),
    dist AS (
        SELECT d.vec_id, d.true_label, c.label AS cand,
               SUM((d.v - c.c) * (d.v - c.c)) AS d2
        FROM d JOIN c ON c.i = d.i
        GROUP BY d.vec_id, d.true_label, c.label
    ),
    asg AS (
        SELECT vec_id, true_label, cand AS assigned_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ROUND(d2, 9), cand) AS rn
        FROM dist
    )
    SELECT true_label, assigned_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM asg WHERE rn = 1
    GROUP BY true_label, assigned_label
    """,
)
def datapipe_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode(as_double_array("embedding")).alias("i", "v"),
    )
    cents = dims.groupBy(
        F.col("true_label").alias("cand"), "i"
    ).agg(F.avg("v").alias("c"))
    dist = (
        dims.join(F.broadcast(cents), "i")
        .groupBy("vec_id", "true_label", "cand")
        .agg(
            F.sum(
                (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.round("d2", 9), "cand")
    return (
        dist.select(
            "true_label",
            F.col("cand").alias("assigned_label"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .groupBy("true_label", "assigned_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# Corpus divergence diagnostics: Shannon entropy of each source's
# token distribution + Jensen-Shannon divergence between two sources
# — the standard "how different is this data mix" meter used when
# weighting pretraining mixtures (and the symmetric, always-finite
# alternative to raw KL). One token group-by per source (combinable),
# a full-outer vocab alignment, then a scalar reduce over vocab rows;
# probabilities are exact integer ratios and every log term is
# written identically in both engines. Scale: O(corpus) scan,
# O(vocab) shuffle, 1-row result. [beyond-reference] mixture
# diagnostics (complements datapipe_dsir_importance).
# --------------------------------------------------------------------
@query(
    "datapipe_source_divergence",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE source IN ('src0', 'src1')
    ),
    c AS (
        SELECT tok,
               CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM tok GROUP BY tok
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM c),
    terms AS (
        SELECT
            CASE WHEN ca > 0 THEN -(CAST(ca AS DOUBLE) / na)
                 * ln(CAST(ca AS DOUBLE) / na) ELSE 0.0 END AS h_a,
            CASE WHEN cb > 0 THEN -(CAST(cb AS DOUBLE) / nb)
                 * ln(CAST(cb AS DOUBLE) / nb) ELSE 0.0 END AS h_b,
            CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / na)
                 * ln((CAST(ca AS DOUBLE) / na)
                      / (0.5 * (CAST(ca AS DOUBLE) / na
                                + CAST(cb AS DOUBLE) / nb)))
                 ELSE 0.0 END
            + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / nb)
                 * ln((CAST(cb AS DOUBLE) / nb)
                      / (0.5 * (CAST(ca AS DOUBLE) / na
                                + CAST(cb AS DOUBLE) / nb)))
                 ELSE 0.0 END AS js_term
        FROM c CROSS JOIN tot
    )
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_vocab,
           ROUND(SUM(h_a), 6) AS entropy_a,
           ROUND(SUM(h_b), 6) AS entropy_b,
           ROUND(SUM(js_term), 6) AS js_divergence
    FROM terms
    """,
)
def datapipe_source_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", F.explode(tokens("text")).alias("tok"))
    )
    c = toks.groupBy("tok").agg(
        F.sum((F.col("source") == "src0").cast("long")).alias("ca"),
        F.sum((F.col("source") == "src1").cast("long")).alias("cb"),
    )
    tot = c.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    j = c.crossJoin(F.broadcast(tot))
    # try_divide: a single-source day zeroes the other LM's token
    # total — its probabilities are NULL on both engines
    pa = F.try_divide(F.col("ca").cast("double"), F.col("na"))
    pb = F.try_divide(F.col("cb").cast("double"), F.col("nb"))
    m = F.lit(0.5) * (pa + pb)
    h_a = F.when(F.col("ca") > 0, -pa * F.log(pa)).otherwise(0.0)
    h_b = F.when(F.col("cb") > 0, -pb * F.log(pb)).otherwise(0.0)
    js = F.when(F.col("ca") > 0, F.lit(0.5) * pa * F.log(pa / m)).otherwise(
        0.0
    ) + F.when(F.col("cb") > 0, F.lit(0.5) * pb * F.log(pb / m)).otherwise(
        0.0
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.round(F.sum(h_a), 6).alias("entropy_a"),
        F.round(F.sum(h_b), 6).alias("entropy_b"),
        F.round(F.sum(js), 6).alias("js_divergence"),
    )


# --------------------------------------------------------------------
# Zipf rank-frequency slope: fit ln(freq) ~ a + b·ln(rank) over the
# top-K vocabulary by OLS closed form — natural corpora land near
# b = -1, so the slope is a one-number corpus-health probe (synthetic
# or templated text shows up as a flat or cliffed curve). Rank is a
# deterministic TakeOrderedAndProject top-K (count desc, token
# tie-break); the OLS sums run over K<=100 rows. Scale: the token
# count is the only corpus-sized stage; everything after is O(K).
# [beyond-reference] corpus statistics.
# --------------------------------------------------------------------
_ZIPF_K = 100


@query(
    "datapipe_zipf_slope",
    oracle=f"""
    WITH c AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT {_ZIPF_K}
    ),
    r AS (
        SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
                       AS DOUBLE)) AS x,
               ln(CAST(n AS DOUBLE)) AS y
        FROM c
    ),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM r
    )
    SELECT CAST(k AS BIGINT) AS k_terms,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
               AS zipf_slope,
           ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                 / k, 6) AS intercept
    FROM s
    """,
)
def datapipe_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(_ZIPF_K)
    )
    r = top.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "tok"))
            .cast("double")
        ).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # try_divide: a 1-term vocabulary (e.g. a corpus of empty texts,
    # where the tokenizer yields the single '' token) has x = ln(1) =
    # 0 for its only point, so the OLS denominator k*sxx - sx^2 is
    # EXACTLY 0 and ANSI division aborts — caught by the round-11
    # singleton-group fuzz sweep. DuckDB float division by zero
    # returns NULL, so try_divide's NULL matches the oracle.
    slope = F.try_divide(
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"),
    )
    return s.select(
        F.col("k").cast("long").alias("k_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            F.try_divide(F.col("sy") - slope * F.col("sx"), F.col("k")), 6
        ).alias("intercept"),
    )


# --------------------------------------------------------------------
# Polymorphic UDTF (Spark 4 static ``analyze``): sliding n-gram
# windows whose OUTPUT SCHEMA is computed on the driver from the
# constant argument n — tok0..tok{n-1} columns plus the joined gram.
# This is the dynamic-schema half of the UDTF API that the fixed
# returnType chunker (datapipe_chunk_udtf) can't exercise; the
# oracle rebuilds the n=3 instance with a range-unnest + slices.
# Same scale shape as chunking: map-side row expansion, no shuffle.
# --------------------------------------------------------------------
@query(
    "datapipe_ngram_udtf",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           toks[CAST(i AS INT)] AS tok0,
           toks[CAST(i + 1 AS INT)] AS tok1,
           toks[CAST(i + 2 AS INT)] AS tok2,
           array_to_string(toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
               AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 100),
         unnest(range(1, len(toks) - 1)) AS u(i)
    """,
)
def datapipe_ngram_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udtfs import NGramWindows

    spark.udtf.register("ngram_windows", NGramWindows)
    # fan out the single-split scan across the session width so the
    # per-row Python UDTF runs on every core's worker instead of the
    # one scan task (no-op at production scale — catalog fan-out
    # guard); the doc_id < 100 filter still pushes below the exchange
    load(
        spark, sf_dir, "documents", fan_out_by=("doc_id",)
    ).createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT g.* FROM documents, "
        "LATERAL ngram_windows(documents.doc_id, text, 3) AS g "
        "WHERE documents.doc_id < 100"
    )


# --------------------------------------------------------------------
# Chi-square independence test + Cramér's V between two categorical
# columns (lang × source) — the feature-association audit you run
# before trusting a sampling stratification or suspecting corpus
# leakage between sources. One conditional-agg pass builds the
# contingency table (combinable, O(|lang|·|source|) rows); expected
# counts come from broadcast marginals; the chi-square sum and
# Cramér's V normalization are closed-form over the tiny table.
# Exact integer counts feed one identically-written double
# expression. [beyond-reference] categorical association.
# --------------------------------------------------------------------
@query(
    "datapipe_chi_square_assoc",
    oracle="""
    WITH ct AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang, source
    ),
    rm AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nr FROM ct GROUP BY lang),
    cm AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nc FROM ct GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS c
            FROM ct),
    terms AS (
        SELECT (CAST(ct.n AS DOUBLE)
                - CAST(rm.nr AS DOUBLE) * cm.nc / tot.nt)
               * (CAST(ct.n AS DOUBLE)
                  - CAST(rm.nr AS DOUBLE) * cm.nc / tot.nt)
               / (CAST(rm.nr AS DOUBLE) * cm.nc / tot.nt) AS t,
               tot.nt AS nt, tot.r AS r, tot.c AS c
        FROM ct JOIN rm USING (lang) JOIN cm USING (source)
        CROSS JOIN tot
    )
    SELECT CAST(MIN(nt) AS BIGINT) AS n_docs,
           ROUND(SUM(t), 6) AS chi2,
           -- nt * (min(r,c)-1) computed in DOUBLE: the BIGINT product
           -- overflows once docs x categories passes 2^63 (both
           -- engines compute the identical double, and the value
           -- feeds a sqrt-ratio where 2^-52 relative error is noise)
           ROUND(sqrt(SUM(t) / (CAST(MIN(nt) AS DOUBLE)
                 * (CASE WHEN MIN(r) < MIN(c) THEN MIN(r)
                         ELSE MIN(c) END - 1))), 6) AS cramers_v
    FROM terms
    """,
)
def datapipe_chi_square_assoc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.staging import stage_boundary

    docs = load(spark, sf_dir, "documents")
    # the contingency table is O(langs x sources) and feeds four
    # consumers (row/col marginals, totals, the join) — staged so the
    # plan scans documents once, not four times
    ct = stage_boundary(
        docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")),
        materialize=False,
    )
    rm = ct.groupBy("lang").agg(F.sum("n").alias("nr"))
    cm = ct.groupBy("source").agg(F.sum("n").alias("nc"))
    tot = ct.agg(
        F.sum("n").alias("nt"),
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
    )
    j = (
        ct.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("nr").cast("double") * F.col("nc") / F.col("nt")
    t = (F.col("n").cast("double") - exp) * (
        F.col("n").cast("double") - exp
    ) / exp
    mindim = F.when(F.min("r") < F.min("c"), F.min("r")).otherwise(
        F.min("c")
    )
    return j.select(t.alias("t"), "nt", "r", "c").agg(
        F.min("nt").alias("n_docs"),
        F.round(F.sum("t"), 6).alias("chi2"),
        # nt * (min(r,c)-1) in DOUBLE (== oracle): the long product
        # wraps once docs x categories passes 2^63
        # try_divide: a 1x1 table (single lang x single source day)
        # has zero degrees of freedom — Cramer's V is NULL on both
        # engines, not an ANSI abort
        F.round(
            F.sqrt(
                F.try_divide(
                    F.sum("t"),
                    F.min("nt").cast("double") * (mindim - 1),
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------
# Weighted median document length, weights = DSIR-style importance
# (here: integer per-doc weight 1 + doc_id % 5 — the deterministic
# stand-in for a learned importance weight). The weighted quantile is
# THE selection primitive once a corpus carries sampling weights:
# value v* = smallest length whose cumulative weight reaches half the
# total. Exact integers end-to-end — cumulative weights come from the
# distributed prefix sum over the (length, weight) groups, never a
# data-sized window, and the pick is one filter + TakeOrdered(1).
# Oracle mirrors with a plain window. [beyond-reference] weighted
# statistics for importance-sampled corpora.
# --------------------------------------------------------------------
@query(
    "datapipe_weighted_median_len",
    oracle="""
    WITH w AS (
        -- NULL lengths carry no position on the length axis (and
        -- Spark orders NULL first vs DuckDB last, which would shift
        -- every cumulative weight)
        SELECT n_chars AS len_chars,
               CAST(SUM(1 + doc_id % 5) AS BIGINT) AS wt
        FROM documents WHERE n_chars IS NOT NULL GROUP BY n_chars
    ),
    c AS (
        SELECT len_chars, wt,
               SUM(wt) OVER (ORDER BY len_chars
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
               SUM(wt) OVER () AS total
        FROM w
    )
    SELECT len_chars AS weighted_median,
           CAST(cum AS BIGINT) AS cum_weight,
           CAST(total AS BIGINT) AS total_weight
    FROM c WHERE 2 * cum >= total
    ORDER BY len_chars LIMIT 1
    """,
)
def datapipe_weighted_median_len(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.prefix import global_prefix_sum

    from ..operators.staging import stage_boundary

    # w feeds the grand total and the prefix pass (data branch +
    # boundary aggregate) — unstaged, documents scanned three times
    # (round-13 scan sweep). Staged (O(distinct lengths) rows), one.
    w = stage_boundary(
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())  # see oracle comment
        .groupBy(F.col("n_chars").alias("len_chars"))
        .agg(F.sum(1 + F.col("doc_id") % 5).alias("wt")),
        materialize=False,
    )
    total = w.agg(F.sum("wt").alias("total"))
    c = global_prefix_sum(w, ["len_chars"], "wt", "cum").crossJoin(
        F.broadcast(total)
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("total"))
        .orderBy("len_chars")
        .limit(1)
        .select(
            F.col("len_chars").alias("weighted_median"),
            F.col("cum").alias("cum_weight"),
            F.col("total").alias("total_weight"),
        )
    )


# --------------------------------------------------------------------
# Exact-count stratified take: EXACTLY k docs per source (not a
# rate), picked by md5 rank so the selection is deterministic,
# uniform within stratum, and identical in any engine — the budget
# allocator for "500 docs from each source for the eval set". The
# rank is a per-stratum window (partitioned by source — parallel
# across strata; WindowGroupLimit pushes the k cutoff into each
# partition before the full sort materializes). Output is per-source
# audit counts plus the exact md5 cut key, so the oracle pins the
# actual selection boundary, not just the counts.
# --------------------------------------------------------------------
_STRAT_K = 200


@query(
    "datapipe_exact_stratified_take",
    oracle=f"""
    WITH r AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('take|' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS rk,
               md5('take|' || CAST(doc_id AS VARCHAR)) AS key
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_taken,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MAX(key) AS cut_key
    FROM r WHERE rk <= {_STRAT_K}
    GROUP BY source
    """,
)
def datapipe_exact_stratified_take(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    key = F.md5(
        F.concat(F.lit("take|"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy("key", "doc_id")
    r = (
        load(spark, sf_dir, "documents")
        .select("source", "n_chars", "doc_id", key.alias("key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRAT_K)
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_taken"),
        F.sum("n_chars").alias("sum_chars"),
        F.max("key").alias("cut_key"),
    )


# --------------------------------------------------------------------
# Normalization-aware exact dedup (CCNet-style): case-fold, collapse
# whitespace runs, strip punctuation, THEN fingerprint — catches the
# near-trivial duplicates (recapitalized, re-wrapped, re-punctuated
# copies) that raw-byte sha256 dedup misses and MinHash overkills.
# The normalizer is four codegen'd string ops shared verbatim with
# the oracle; the group-by is the same O(docs) fingerprint shuffle as
# datapipe_exact_dedup, so the upgrade is free at any scale. Output
# compares raw-exact vs normalized-exact duplicate counts.
# --------------------------------------------------------------------
@query(
    "datapipe_normalized_dedup",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               md5(text) AS raw_fp,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_fp
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS n_raw_unique,
           CAST(COUNT(DISTINCT norm_fp) AS BIGINT) AS n_norm_unique,
           CAST(COUNT(*) - COUNT(DISTINCT raw_fp) AS BIGINT)
               AS raw_dups,
           CAST(COUNT(*) - COUNT(DISTINCT norm_fp) AS BIGINT)
               AS norm_dups
    FROM n
    """,
)
def datapipe_normalized_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.col("text")), r"[.,!?;:]", ""
            ),
            " +",
            " ",
        )
    )
    n = load(spark, sf_dir, "documents").select(
        F.md5(F.col("text")).alias("raw_fp"),
        F.md5(norm).alias("norm_fp"),
    )
    return n.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("raw_fp").alias("n_raw_unique"),
        F.countDistinct("norm_fp").alias("n_norm_unique"),
        (F.count(F.lit(1)) - F.countDistinct("raw_fp")).alias(
            "raw_dups"
        ),
        (F.count(F.lit(1)) - F.countDistinct("norm_fp")).alias(
            "norm_dups"
        ),
    )


# --------------------------------------------------------------------
# Entity resolution (block -> verify -> best-match) over the part
# catalog: deterministic corruption drops the 3rd character of the
# last word for every 5th part (the OCR/typo stand-in), then dirty
# names are matched back to the clean catalog by first-word BLOCKING
# + Levenshtein<=2 verification + (distance, name) best-match rank.
# The scale discipline: both sides are reduced to DISTINCT NAMES
# before the block join (name vocabulary is bounded; the quadratic
# verify runs on vocab x vocab within tiny blocks, never row x row),
# and per-name part counts are joined back afterwards. This is the
# record-linkage pattern (Fellegi-Sunter blocking) every catalog /
# customer-360 pipeline runs. [beyond-reference] entity resolution.
# --------------------------------------------------------------------
@query(
    "datapipe_entity_resolution",
    oracle="""
    WITH dirty AS (
        SELECT p_partkey,
               split_part(p_name, ' ', 1) || ' ' ||
               CASE WHEN length(split_part(p_name, ' ', 2)) > 3
                    THEN substring(split_part(p_name, ' ', 2), 1, 2)
                         || substring(split_part(p_name, ' ', 2), 4)
                    ELSE split_part(p_name, ' ', 2) END AS name
        FROM part WHERE p_partkey % 5 = 0
    ),
    dn AS (
        SELECT name, split_part(name, ' ', 1) AS blk,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM dirty GROUP BY name
    ),
    cn AS (
        SELECT DISTINCT p_name AS clean_name,
               split_part(p_name, ' ', 1) AS blk
        FROM part
    ),
    cand AS (
        SELECT dn.name, dn.n_parts, cn.clean_name,
               CAST(levenshtein(dn.name, cn.clean_name) AS BIGINT)
                   AS lev
        FROM dn JOIN cn USING (blk)
        WHERE levenshtein(dn.name, cn.clean_name) <= 2
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY name ORDER BY lev, clean_name
               ) AS rn
        FROM cand
    )
    SELECT name AS dirty_name, clean_name AS matched_name, lev,
           n_parts
    FROM best WHERE rn = 1
    """,
)
def datapipe_entity_resolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w2 = F.split(F.col("p_name"), " ").getItem(1)
    corrupted = F.concat(
        F.split(F.col("p_name"), " ").getItem(0),
        F.lit(" "),
        F.when(
            F.length(w2) > 3,
            F.concat(
                F.substring(w2, 1, 2), F.expr("substring(split(p_name, ' ')[1], 4)")
            ),
        ).otherwise(w2),
    )
    dirty = part.filter(F.col("p_partkey") % 5 == 0).select(
        corrupted.alias("name")
    )
    dn = (
        dirty.groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.split(F.col("name"), " ").getItem(0))
    )
    cn = (
        part.select(F.col("p_name").alias("clean_name"))
        .distinct()
        .withColumn("blk", F.split(F.col("clean_name"), " ").getItem(0))
    )
    cand = (
        # merge hint: both sides are DISTINCT-NAME frames (vocabulary-
        # scale on both sides) — sort-merge is the spill-safe strategy
        dn.join(cn.hint("merge"), "blk")
        .withColumn(
            "lev", F.levenshtein(F.col("name"), F.col("clean_name"))
        )
        .filter(F.col("lev") <= 2)
    )
    wb = Window.partitionBy("name").orderBy("lev", "clean_name")
    return (
        cand.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            F.col("name").alias("dirty_name"),
            F.col("clean_name").alias("matched_name"),
            F.col("lev").cast("long").alias("lev"),
            "n_parts",
        )
    )


# --------------------------------------------------------------------
# MMR diverse top-k selection (Maximal Marginal Relevance, Carbonell
# & Goldstein 1998) — the retrieval-diversity operator every RAG /
# eval-set-construction pipeline needs: greedily pick k=5 vectors
# maximizing lambda*sim(query,d) - (1-lambda)*max_{s in S} sim(d,s),
# so results are relevant AND mutually dissimilar. Greedy selection
# is inherently sequential in k: each round broadcasts the single
# chosen embedding (a bounded 1-row collect, same discipline as the
# IVF centroid fit) and updates the running penalty map-side; the
# candidate scan stays distributed. The oracle replays all 5
# selections as chained CTEs, so every round's argmax — under the
# ROUND(score,6)+vec_id rank contract — is hash-pinned.
# [beyond-reference] retrieval diversity.
# --------------------------------------------------------------------
_MMR_K, _MMR_LAMBDA, _MMR_CAND = 5, "0.7", 200


def _mmr_oracle() -> str:
    lam = _MMR_LAMBDA
    one_m = "0.3"
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    parts = [f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qe FROM embeddings
        WHERE vec_id = 0 AND embedding IS NOT NULL
    ),
    c0 AS (
        SELECT * FROM (
            SELECT vec_id, embedding::DOUBLE[] AS ce,
                   {cos.format(a="embedding::DOUBLE[]", b="qe")} AS simq,
                   CAST(-1.0 AS DOUBLE) AS pen
            FROM embeddings, q
            WHERE vec_id <> 0 AND vec_id < {_MMR_CAND}
                  AND embedding IS NOT NULL
        ) WHERE simq IS NOT NULL
    )"""]
    for k in range(1, _MMR_K + 1):
        parts.append(f""",
    p{k} AS (
        SELECT vec_id AS pick, ce AS pce,
               ROUND({lam} * simq - {one_m} * GREATEST(pen, 0.0), 6)
                   AS score
        FROM c{k - 1}
        ORDER BY score DESC, vec_id LIMIT 1
    )""")
        if k < _MMR_K:
            parts.append(f""",
    c{k} AS (
        SELECT c.vec_id, c.ce, c.simq,
               GREATEST(c.pen, {cos.format(a="c.ce", b="p.pce")}) AS pen
        FROM c{k - 1} c, p{k} p WHERE c.vec_id <> p.pick
    )""")
    sel = "\n    UNION ALL ".join(
        f"SELECT {k} AS sel_rank, pick AS vec_id, score FROM p{k}"
        for k in range(1, _MMR_K + 1)
    )
    parts.append(f"\n    {sel}")
    return "".join(parts)


@query("datapipe_mmr_diverse_topk", oracle=_mmr_oracle())
def datapipe_mmr_diverse_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.staging import stage_boundary

    lam, one_m = float(_MMR_LAMBDA), 0.3
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("qe")
    )
    state = (
        emb.filter(
            (F.col("vec_id") != 0) & (F.col("vec_id") < _MMR_CAND)
        )
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            as_double_array("embedding").alias("ce"),
            cosine_similarity(
                as_double_array("embedding"), F.col("qe")
            ).alias("simq"),
            F.lit(-1.0).alias("pen"),
        )
        # NULL simq (NULL vector, or zero-norm query/candidate) is not
        # a rankable candidate — a zero-norm query yields an EMPTY
        # pick list instead of k arbitrary rows (or a driver crash on
        # float(None))
        .filter(F.col("simq").isNotNull())
    )
    # each greedy round otherwise re-executes the scan+crossJoin
    # lineage (k jobs x full corpus read); one lazy cache fill makes
    # rounds 2..k read blocks
    state = stage_boundary(state, materialize=False)
    score = F.round(
        F.lit(lam) * F.col("simq")
        - F.lit(one_m) * F.greatest(F.col("pen"), F.lit(0.0)),
        6,
    )
    out_rows = []
    for k in range(1, _MMR_K + 1):
        picked = (
            state.withColumn("score", score)
            .orderBy(F.desc("score"), "vec_id")
            .limit(1)
            .collect()
        )  # bounded: ONE row per round, k rounds total
        if not picked:  # candidate pool exhausted (or empty corpus)
            break
        pick = picked[0]
        out_rows.append((k, int(pick["vec_id"]), float(pick["score"])))
        if k < _MMR_K:
            chosen = F.array(*[F.lit(x) for x in pick["ce"]])
            state = state.filter(
                F.col("vec_id") != int(pick["vec_id"])
            ).withColumn(
                "pen",
                F.greatest(
                    F.col("pen"),
                    cosine_similarity(F.col("ce"), chosen),
                ),
            )
    return spark.createDataFrame(
        out_rows, "sel_rank int, vec_id bigint, score double"
    )


# --------------------------------------------------------------------
# Substring-level exact dedup, part 1: PARAGRAPH dedup with rewrite.
# The complement to doc-level datapipe_exact_dedup: documents are cut
# into fixed 10-word "paragraphs" (the fixture corpus is one line per
# doc, so the chunk grid stands in for real paragraph breaks), each
# distinct paragraph keeps its FIRST occurrence corpus-wide
# (min (doc_id, para_idx)), and every document is REASSEMBLED from its
# surviving paragraphs — the output is cleaned text, not a dup score
# (datapipe_ngram_novelty already scores; this one rewrites, which is
# what a training-data pipeline actually ships).
#
# Scale shape: chunking is a pure map (transform over sequence — no
# explode until the per-paragraph row is genuinely needed); the only
# shuffles are the hash exchange on the paragraph string (each
# window group is exactly one paragraph's duplicate set) and the
# per-doc regroup. Nothing is ever all-pairs, state is O(paragraphs).
# --------------------------------------------------------------------
_PARA_W = 10  # words per paragraph

@query(
    "datapipe_paragraph_dedup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    paras AS (
        SELECT doc_id, t.i AS para_idx,
               array_to_string(
                   w[CAST(t.i * {_PARA_W} + 1 AS BIGINT)
                     :CAST(t.i * {_PARA_W} + {_PARA_W} AS BIGINT)], ' ')
                   AS para
        FROM d, LATERAL (
            SELECT unnest(range(0, CAST(ceil(len(w) / {_PARA_W}.0)
                                        AS BIGINT))) AS i) t
    ),
    rn AS (
        SELECT doc_id, para_idx, para,
               row_number() OVER (PARTITION BY para
                                  ORDER BY doc_id, para_idx) AS rn
        FROM paras
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
                               ' ' ORDER BY para_idx), '') AS kept_text
    FROM rn GROUP BY doc_id
    """,
)
def datapipe_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "text")
    )
    p = _PARA_W
    # chunk grid built map-side: bind toks once (see ngram_shingles on
    # why the 1-element transform), then one paragraph per grid cell
    paras_expr = (
        f"element_at(transform(array(split(text, ' ')), toks -> "
        f"transform(sequence(0, CAST(ceil(size(toks) / {p}.0) AS INT) - 1), "
        f"i -> array_join(slice(toks, i * {p} + 1, {p}), ' '))), 1)"
    )
    pe = docs.select(
        "doc_id",
        F.posexplode(F.expr(paras_expr)).alias("para_idx", "para"),
    )
    w = Window.partitionBy("para").orderBy("doc_id", "para_idx")
    rn = pe.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("para_idx", "para")
    )  # collect_list drops the NULLs (losing paragraphs)
    return rn.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["para"],
            ),
            " ",
        ).alias("kept_text"),
    )


# --------------------------------------------------------------------
# Substring-level exact dedup, part 2: CONTENT-DEFINED chunking
# (rsync/LBFS-style anchors). Fixed grids shift every chunk after one
# inserted word; content-defined boundaries (a word is a boundary
# when md5(word) mod 8 == 0, expected chunk ~8 words) realign
# immediately, so shared passages dedup across documents even at
# different offsets — the suffix-anchor idea from the round-7 verdict
# expressed as a pure groupBy pipeline.
#
# Scale shape: the boundary bit is map-side; chunk ids come from a
# cumulative sum PARTITIONED BY doc (per-doc window, never global);
# chunk strings shuffle once for the distinct-doc count. O(words)
# rows in flight, no pair join anywhere.
# --------------------------------------------------------------------
def _cdc_boundary_sql(word_expr: str) -> str:
    """Portable md5 first-hex-digit mod 8 == 0 boundary test —
    identical text in Spark SQL and DuckDB (same trick as
    _cm_bucket_sql)."""
    return (
        f"CASE WHEN ((instr('0123456789abcdef', "
        f"substring(md5({word_expr}), 1, 1)) - 1) % 8) = 0 "
        f"THEN 1 ELSE 0 END"
    )


@query(
    "datapipe_cdc_chunk_dedup",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, t.i AS pos, w[t.i + 1] AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents
              WHERE text IS NOT NULL AND text <> '') d,
        LATERAL (SELECT unnest(range(0, len(w))) AS i) t
    ),
    b AS (
        SELECT doc_id, pos, word, {_cdc_boundary_sql('word')} AS isb
        FROM words
    ),
    c AS (
        SELECT doc_id, pos, word,
               SUM(isb) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS chunk_id
        FROM b
    ),
    chunks AS (
        SELECT doc_id, chunk_id,
               string_agg(word, ' ' ORDER BY pos) AS chunk
        FROM c GROUP BY doc_id, chunk_id
    ),
    nd AS (
        SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs
        FROM chunks GROUP BY chunk
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           ROUND(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS dup_ratio
    FROM chunks JOIN nd USING (chunk)
    GROUP BY doc_id
    """,
)
def datapipe_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "text")
    )
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).withColumn("isb", F.expr(_cdc_boundary_sql("word")))
    wdoc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = words.withColumn("chunk_id", F.sum("isb").over(wdoc))
    chunks = c.groupBy("doc_id", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("chunk")
    )
    # Round 14, examined and reverted: staging the re-assembled chunk
    # frame (so the chunk-frequency aggregate and the join-back share
    # one pass) A/B'd 0.71x at sf0.1 — the worst loser of the round's
    # staging candidates: the chunk column carries the full document
    # text, so the persist writes ~corpus bytes to save a re-read of
    # the same bytes. The docs x2 stays at every scale.
    nd = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    dup = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
    return (
        # shuffle_hash hint: nd is keyed by chunk CONTENT
        # (corpus-scale); a static broadcast from the post-explode
        # estimate cannot scale
        chunks.join(nd.hint("shuffle_hash"), "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            dup.alias("n_dup_chunks"),
            F.round(dup * 1.0 / F.count(F.lit(1)), 6).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------
# Snapshot diff — the read-side complement to the CDC merge
# (operators/merge.py writes changes; this one DISCOVERS them between
# two table versions): full-outer join on the key plus a row
# fingerprint over every non-key column classifies each key as
# added / removed / changed / unchanged. The "v2" snapshot is derived
# deterministically from the fixture (drops, in-place edits, inserts)
# so both engines diff identical inputs.
#
# Scale shape: one hash exchange per side on the key, fingerprints
# are map-side md5 — the diff of two 100 TB snapshots is exactly one
# co-partitioned join wide. The summary output keeps the driver row
# bounded; a real pipeline would write the per-key status instead.
# --------------------------------------------------------------------
_DIFF_COLS = "CAST(doc_id AS VARCHAR), COALESCE(text, chr(1)), COALESCE(lang, chr(1)), COALESCE(source, chr(1)), COALESCE(CAST(n_chars AS VARCHAR), chr(1))"
_DIFF_V2_SQL = """
    SELECT doc_id,
           text,
           CASE WHEN doc_id % 13 = 0 THEN upper(lang) ELSE lang END AS lang,
           source, n_chars
    FROM documents WHERE doc_id % 17 <> 0
    UNION ALL
    SELECT doc_id + 1000000, text, lang, 'reingest', n_chars
    FROM documents WHERE doc_id % 23 = 0
"""


@query(
    "datapipe_table_diff",
    oracle=f"""
    WITH v1 AS (
        SELECT doc_id, md5(concat_ws('|', {_DIFF_COLS})) AS fp
        FROM documents
    ),
    v2 AS (
        SELECT doc_id, md5(concat_ws('|', {_DIFF_COLS})) AS fp
        FROM ({_DIFF_V2_SQL})
    ),
    d AS (
        SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN v1.fp <> v2.fp THEN 'changed'
                    ELSE 'unchanged' END AS status,
               COALESCE(v1.doc_id, v2.doc_id) AS k
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM d GROUP BY status
    """,
)
def datapipe_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sentinel = F.lit("\x01")

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    F.coalesce("text", sentinel),
                    F.coalesce("lang", sentinel),
                    F.coalesce("source", sentinel),
                    F.coalesce(F.col("n_chars").cast("string"), sentinel),
                )
            ).alias("fp"),
        )

    v2_rows = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 13 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
        "n_chars",
    ).unionByName(
        docs.filter(F.col("doc_id") % 23 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
            "lang",
            F.lit("reingest").alias("source"),
            "n_chars",
        )
    )
    v1 = fp(docs).alias("v1")
    v2 = fp(v2_rows).alias("v2")
    d = v1.join(v2, F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer")
    status = (
        F.when(F.col("v1.doc_id").isNull(), "added")
        .when(F.col("v2.doc_id").isNull(), "removed")
        .when(F.col("v1.fp") != F.col("v2.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        d.select(
            status.alias("status"),
            F.coalesce(F.col("v1.doc_id"), F.col("v2.doc_id")).alias("k"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
    )


# --------------------------------------------------------------------
# Feature hashing (the "hashing trick", Weinberger et al. ICML'09):
# tokens index into a fixed 1024-bucket space via md5, with a second
# hash bit choosing the sign so collisions cancel in expectation —
# the unbounded-vocabulary vectorizer that needs NO fitted vocab and
# therefore no driver state at any corpus size. Reported corpus-wide:
# the 20 heaviest buckets by |signed weight| plus collision stats.
# Map-side explode + one groupBy(bucket); the top-20 is a
# TakeOrdered, never a global sort.
# --------------------------------------------------------------------
_FH_BUCKETS = 1024


def _fh_bucket_sql(tok: str) -> str:
    """md5 hex digits 1-3 -> [0, 4096) folded mod 1024 — portable."""
    h = f"md5({tok})"
    d = "instr('0123456789abcdef', substring({h}, {i}, 1)) - 1"
    return (
        "(("
        + d.format(h=h, i=1)
        + ") * 256 + ("
        + d.format(h=h, i=2)
        + ") * 16 + ("
        + d.format(h=h, i=3)
        + f")) % {_FH_BUCKETS}"
    )


def _fh_sign_sql(tok: str) -> str:
    """md5 hex digit 4 parity -> +1 / -1 (independent of the bucket
    digits, as the hashing trick requires)."""
    return (
        f"CASE WHEN (instr('0123456789abcdef', "
        f"substring(md5({tok}), 4, 1)) - 1) % 2 = 0 THEN 1 ELSE -1 END"
    )


@query(
    "datapipe_feature_hashing",
    oracle=f"""
    WITH toks AS (
        SELECT t.tok
        FROM (SELECT string_split(text, ' ') AS w FROM documents
              WHERE text IS NOT NULL AND text <> '') d,
        LATERAL (SELECT unnest(d.w) AS tok) t
    ),
    h AS (
        SELECT {_fh_bucket_sql('tok')} AS bucket,
               {_fh_sign_sql('tok')} AS sign,
               tok
        FROM toks
    ),
    b AS (
        SELECT bucket,
               CAST(SUM(sign) AS BIGINT) AS weight,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_terms
        FROM h GROUP BY bucket
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, weight, n_tokens,
           n_distinct_terms
    FROM b
    ORDER BY abs(weight) DESC, bucket
    LIMIT 20
    """,
)
def datapipe_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    h = toks.select(
        F.expr(_fh_bucket_sql("tok")).cast("long").alias("bucket"),
        F.expr(_fh_sign_sql("tok")).alias("sign"),
        "tok",
    )
    return (
        h.groupBy("bucket")
        .agg(
            F.sum("sign").alias("weight"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct_terms"),
        )
        .orderBy(F.abs(F.col("weight")).desc(), "bucket")
        .limit(20)
    )


# --------------------------------------------------------------------
# Temperature-scaled mixture weights (the multilingual/multi-source
# resampling rule from GPT-3/PaLM data recipes): source sampling
# probability proportional to p_i^T with T < 1, upweighting rare
# sources. T = 0.5 on purpose: p^0.5 = sqrt(p), and IEEE 754 sqrt is
# CORRECTLY ROUNDED by spec — the only power that is bit-identical
# across Spark's JVM and DuckDB without an epsilon (general pow/exp
# carry no such guarantee; see the decayed-recency query for the
# rational-weights alternative). O(sources) aggregate; the epochs
# column is what a sampler multiplies into each source's plan.
# --------------------------------------------------------------------
@query(
    "datapipe_temperature_mixture",
    oracle="""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents WHERE source IS NOT NULL
        GROUP BY source
    ),
    t AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
               SUM(sqrt(n_docs * 1.0)) AS z
        FROM s
    )
    SELECT s.source, s.n_docs, s.n_chars,
           ROUND(s.n_docs * 1.0 / t.total, 6) AS p_raw,
           ROUND(sqrt(s.n_docs * 1.0) / t.z, 6) AS p_temp,
           ROUND((sqrt(s.n_docs * 1.0) / t.z)
                 / (s.n_docs * 1.0 / t.total), 6) AS epochs
    FROM s, t
    """,
)
def datapipe_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    t = s.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.sqrt(F.col("n_docs") * 1.0)).alias("z"),
    )
    p_raw = F.col("n_docs") * 1.0 / F.col("total")
    p_temp = F.sqrt(F.col("n_docs") * 1.0) / F.col("z")
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_raw, 6).alias("epochs"),
    )


# --------------------------------------------------------------------
# Span-corruption example synthesis (the T5 denoising objective's
# data prep): deterministically mask ~1-in-4 word spans (3-word
# spans whose grid cell hashes to 0 mod 4), emitting per document the
# corrupted input (spans replaced by <extra_id_K> sentinels) and the
# target sequence (sentinels + the dropped spans). A REWRITE op like
# the paragraph dedup: the output is training text, not a score.
# Pure map over the chunk grid + two ordered reassemblies per doc —
# no shuffle beyond the per-doc regroup, deterministic via md5 so
# both engines build byte-identical pairs.
# --------------------------------------------------------------------
_SPAN_W = 3  # words per maskable span


@query(
    "datapipe_span_corruption",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    spans AS (
        SELECT doc_id, t.i AS span_idx,
               array_to_string(
                   w[CAST(t.i * {_SPAN_W} + 1 AS BIGINT)
                     :CAST(t.i * {_SPAN_W} + {_SPAN_W} AS BIGINT)], ' ')
                   AS span,
               CASE WHEN ((instr('0123456789abcdef',
                                 substring(md5(concat(CAST(doc_id AS
                                 VARCHAR), ':', CAST(t.i AS VARCHAR))),
                                 1, 1)) - 1) % 4) = 0
                    THEN 1 ELSE 0 END AS masked
        FROM d, LATERAL (
            SELECT unnest(range(0, CAST(ceil(len(w) / {_SPAN_W}.0)
                                        AS BIGINT))) AS i) t
    ),
    numbered AS (
        SELECT doc_id, span_idx, span, masked,
               SUM(masked) OVER (PARTITION BY doc_id ORDER BY span_idx
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - masked AS k
        FROM spans
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(masked) AS BIGINT) AS n_masked,
           string_agg(CASE WHEN masked = 1
                           THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
                           ELSE span END, ' ' ORDER BY span_idx)
               AS corrupted,
           COALESCE(string_agg(CASE WHEN masked = 1
                           THEN '<extra_id_' || CAST(k AS VARCHAR)
                                || '> ' || span END,
                           ' ' ORDER BY span_idx), '') AS target
    FROM numbered GROUP BY doc_id
    """,
)
def datapipe_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "text")
    )
    sw = _SPAN_W
    spans_expr = (
        f"element_at(transform(array(split(text, ' ')), toks -> "
        f"transform(sequence(0, CAST(ceil(size(toks) / {sw}.0) AS INT) - 1), "
        f"i -> array_join(slice(toks, i * {sw} + 1, {sw}), ' '))), 1)"
    )
    pe = docs.select(
        "doc_id", F.posexplode(F.expr(spans_expr)).alias("span_idx", "span")
    )
    mask_expr = (
        "CASE WHEN ((instr('0123456789abcdef', substring(md5(concat("
        "CAST(doc_id AS STRING), ':', CAST(span_idx AS STRING))), 1, 1))"
        " - 1) % 4) = 0 THEN 1 ELSE 0 END"
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = pe.withColumn("masked", F.expr(mask_expr)).withColumn(
        "k", F.sum("masked").over(w_run) - F.col("masked")
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")
    )
    corrupted_piece = F.when(F.col("masked") == 1, sentinel).otherwise(
        F.col("span")
    )
    target_piece = F.when(
        F.col("masked") == 1, F.concat(sentinel, F.lit(" "), F.col("span"))
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("span_idx", "piece", "tpiece"))
    )
    return (
        numbered.select(
            "doc_id",
            "span_idx",
            "masked",
            corrupted_piece.alias("piece"),
            target_piece.alias("tpiece"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("masked").alias("n_masked"),
            F.array_join(
                F.transform(ordered, lambda s: s["piece"]), " "
            ).alias("corrupted"),
            F.array_join(
                F.filter(
                    F.transform(ordered, lambda s: s["tpiece"]),
                    lambda x: x.isNotNull(),
                ),
                " ",
            ).alias("target"),
        )
    )


# --------------------------------------------------------------------
# Hash-based Bernoulli sampling — the ORACLE-PAIRED sampler. Seeded
# rand() sampling is engine-specific (our X1/O2 queries are rows-only
# by design); hashing the KEY into [0,100) and keeping < rate makes
# the sample a pure function of the data — reproducible across
# engines, runs, and cluster layouts, and stable under re-partitioning
# (the property that makes hash-sampling the production standard for
# holdout carve-outs: a row's membership never flips when the job is
# re-run or the input re-split). Map-side filter, zero shuffle before
# the summary aggregate.
# --------------------------------------------------------------------
def _hash_pct_sql(key_expr: str) -> str:
    """Portable md5 -> [0, 100) bucket (same idiom as _cm_bucket_sql:
    two hex digits = [0,256), folded mod 100 keeps it 1-expression)."""
    h = f"md5(concat('smp', {key_expr}))"
    return (
        f"(((instr('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substring({h}, 2, 1)) - 1) % 100)"
    )


@query(
    "datapipe_hash_sample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, n_chars,
               {_hash_pct_sql("CAST(doc_id AS VARCHAR)")} AS pct
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN pct < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(SUM(CASE WHEN pct < 10 THEN n_chars ELSE 0 END)
                AS BIGINT) AS sampled_chars,
           CAST(MIN(CASE WHEN pct < 10 THEN doc_id END) AS BIGINT)
               AS first_sampled_doc
    FROM s
    WHERE source IS NOT NULL
    GROUP BY source
    """,
)
def datapipe_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .withColumn(
            "pct", F.expr(_hash_pct_sql("CAST(doc_id AS STRING)"))
        )
    )
    sampled = F.col("pct") < 10
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(sampled, 1).otherwise(0)).alias("n_sampled"),
        F.sum(F.when(sampled, F.col("n_chars")).otherwise(0)).alias(
            "sampled_chars"
        ),
        F.min(F.when(sampled, F.col("doc_id"))).alias(
            "first_sampled_doc"
        ),
    )


# --------------------------------------------------------------------
# Near-dup-cluster-safe train/val split — the dedup-then-split
# discipline: assigning splits per DOCUMENT leaks near-duplicates of
# training docs into validation (the classic C4/Pile evaluation bug).
# The constructive twin of datapipe_split_leakage_audit: the audit
# MEASURES how much a naive doc_id-keyed split leaks through band
# collisions; this query BUILDS a split keyed by the cluster
# representative and asserts the no-straddle invariant as data.
# SCOPE of the guarantee — single-hop, same as datapipe_neardup_clusters:
# rep_id is ONE round of min-over-shared-buckets, not connected
# components, so docs that share a band bucket DIRECTLY always land on
# the same side, but a transitive chain A~B~C (where C shares a bucket
# only with B) can give A,B rep A while C gets rep B — C may then split
# opposite its 2-hop near-dup. The straddling_clusters audit is grouped
# by rep_id, so it verifies the single-hop invariant (0 by
# construction), NOT transitive-closure safety. For full transitive
# safety, key the split by datapipe_neardup_components' converged
# component_id instead (iterated min-propagation to fixpoint; rows-only
# there because the iteration count is data-dependent).
# The split key must be the CLUSTER representative, so every member
# of a near-dup cluster lands on the same side by construction. Reuse
# of the MinHash/LSH machinery: rep_id per doc exactly as
# datapipe_neardup_clusters (bucket minima via window, never a pair
# join), split = md5-hash of rep_id under 80/20 (the oracle-paired
# hash-Bernoulli idiom), then ONE per-cluster aggregate carries the
# whole audit — doc counts per side, cluster count, and the
# straddling-clusters invariant (clusters whose members disagree on
# the split; 0 by construction, asserted as DATA cross-engine like
# the group-k-fold no-straddle audit). At 100 TB: the band window and
# two group-bys are all O(docs); nothing new materializes beyond the
# cluster frame.
# --------------------------------------------------------------------
@query(
    "datapipe_cluster_safe_split",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_FROM_SIG_SQL}),
    bucket_min AS (
        SELECT band_id, band_key, MIN(doc_id) AS bucket_rep
        FROM bands GROUP BY band_id, band_key
    ),
    reps AS (
        SELECT b.doc_id, MIN(m.bucket_rep) AS rep_id
        FROM bands b
        JOIN bucket_min m
          ON m.band_id = b.band_id AND m.band_key = b.band_key
        GROUP BY b.doc_id
    ),
    assigned AS (
        SELECT doc_id, rep_id,
               CASE WHEN {_hex16_sql("'split|' || CAST(rep_id AS VARCHAR)")}
                         < 52429
                    THEN 'train' ELSE 'val' END AS split
        FROM reps
    ),
    per_cluster AS (
        SELECT rep_id,
               COUNT(*) AS n,
               SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
               COUNT(DISTINCT split) AS ns
        FROM assigned GROUP BY rep_id
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(tr) AS BIGINT) AS train_docs,
           CAST(SUM(n - tr) AS BIGINT) AS val_docs,
           CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS straddling_clusters
    FROM per_cluster
    """,
)
def datapipe_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _bands(_signatures(spark, sf_dir))
    w = Window.partitionBy("band_id", "band_key")
    reps = (
        bands.withColumn("bucket_rep", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("rep_id"))
    )
    split_hex = _hex16_sql("'split|' || CAST(rep_id AS STRING)")
    assigned = reps.withColumn(
        "split",
        F.when(F.expr(split_hex) < 52429, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )
    per_cluster = assigned.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("tr"),
        F.countDistinct("split").alias("ns"),
    )
    return per_cluster.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("tr").alias("train_docs"),
        F.sum(F.col("n") - F.col("tr")).alias("val_docs"),
        F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)).alias(
            "straddling_clusters"
        ),
    )


# --------------------------------------------------------------------
# RAG-style document chunking: fixed-size token windows with OVERLAP
# (chunk = 64 tokens, stride = 48, i.e. 16-token overlap) — the
# retrieval-corpus preparation step every RAG pipeline runs before
# embedding. Complements, not duplicates, its two neighbors:
# datapipe_chunk_udtf cuts NON-overlapping 50-token chunks and exists
# as the SS2.11 Python-UDTF demonstration (Arrow lateral join);
# datapipe_pack_sequences packs the TRAINING stream (docs straddle
# chunk edges, per-shard offsets). Overlapping retrieval windows are
# a third semantic, and this plan stays entirely JVM-side. Pure map-side at any scale: chunk starts are a
# compile-time `sequence()` over the token count (no explode of raw
# tokens, no shuffle until the caller groups), each chunk is a
# 1-based `slice` of the token array (both engines clamp
# out-of-range identically — pinned in the verify notes), and the
# chunk fingerprint is md5 of the re-joined tokens so the oracle
# compares content without shipping chunk text. A doc shorter than
# one stride still yields exactly one chunk (GREATEST guard on the
# sequence upper bound).
# --------------------------------------------------------------------
_CHUNK_TOKS = 64
_CHUNK_STRIDE = 48


@query(
    "datapipe_doc_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT doc_id,
               i.k AS chunk_idx,
               1 + {_CHUNK_STRIDE} * i.k AS chunk_start,
               toks[1 + {_CHUNK_STRIDE} * i.k :
                    {_CHUNK_TOKS} + {_CHUNK_STRIDE} * i.k] AS ctoks
        FROM t, LATERAL (
            SELECT unnest(range(0,
                CAST(CEIL(GREATEST(len(toks) - {_CHUNK_TOKS}, 0)
                          * 1.0 / {_CHUNK_STRIDE}) AS BIGINT) + 1)) AS k
        ) i
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(len(ctoks) AS INT) AS chunk_toks,
           md5(array_to_string(ctoks, ' ')) AS chunk_md5
    FROM c
    """,
)
def datapipe_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", tokens("text").alias("toks"))
    )
    n_chunks = (
        F.ceil(
            F.greatest(F.size("toks") - _CHUNK_TOKS, F.lit(0))
            * 1.0
            / _CHUNK_STRIDE
        ).cast("int")
        + 1
    )
    c = t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        (1 + _CHUNK_STRIDE * F.col("chunk_idx")).alias("chunk_start"),
        F.slice(
            "toks",
            1 + _CHUNK_STRIDE * F.col("chunk_idx"),
            F.lit(_CHUNK_TOKS),
        ).alias("ctoks"),
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.size("ctoks").alias("chunk_toks"),
        F.md5(F.array_join("ctoks", " ")).alias("chunk_md5"),
    )
