"""Document deduplication for large-scale training-data pipelines.

Five strategies over a documents table (id + text):

- exact:      hash-groupBy on md5(text) — one shuffle, JVM-side
- MinHash-LSH: shingle → minhash signature (numpy Arrow UDF) → band →
               bucket-join → exact-Jaccard verify inside buckets
- SimHash:    64-bit token-hash fingerprint; Hamming-≤k pairs found by
               the pigeonhole band trick (split into k+1 chunks; any
               pair within distance k shares ≥1 exact chunk)
- n-gram Jaccard: exact verification metric (applied to LSH candidates;
               never all-pairs)
- embedding cosine: see similarity.py (ANN path)

Scale notes: nothing here is O(n²).  Every candidate-generation step is
a groupBy on a band/chunk key with bucket-size caps; exact verification
only touches candidate pairs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from powerbi_ontology_extractor_spark.operators.canonicalize import (
    capped_bucket_pairs,
    connected_components,
    lsh_candidate_pairs,
)


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_docs,
    doc_ids).  One hash aggregation; md5 chosen for cross-engine
    comparability."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id representative per identical text.

    min_by hash AGGREGATE, not a row_number window: the window put each
    duplicate group into one task's sort, and mega-duplicate boilerplate
    (the #1 reason to run exact dedup on a crawl) is exactly the hot
    key.  Partial map-side aggregation keeps at most one row per
    (hash, map partition), so a 10^8-copy document costs each task O(1)
    memory and the reduce side sees one row per partition, not 10^8.
    The canonical survivor is unchanged (min id per group).
    """
    rep = docs.groupBy(F.md5(F.col(text_col)).alias("_h")).agg(
        F.min_by(F.struct("*"), F.col(id_col)).alias("_r")
    )
    return rep.select("_r.*")


def word_ngrams(c: F.Column, n: int = 3) -> F.Column:
    """Distinct word-n-gram array of a text column, fully JVM-side:
    tokenize → sliding n-grams via transform over an index sequence →
    array_distinct.  The gram unit shared by ngram_jaccard and the
    MinHash verify stage (which precomputes it once per document)."""
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def ngram_jaccard(
    a: F.Column, b: F.Column, n: int = 3
) -> F.Column:
    """Exact word-n-gram Jaccard between two text columns, fully
    JVM-side: tokenize → sliding n-grams via transform over an index
    sequence → array_intersect/union."""
    ga, gb = word_ngrams(a, n), word_ngrams(b, n)
    inter = F.size(F.array_intersect(ga, gb))
    union = F.size(F.array_union(ga, gb))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def _parallelism_floor(df: DataFrame) -> DataFrame:
    """Repartition to core count ONLY when the plan has fewer
    partitions (guide §2/§6): a one-file/one-row-group input otherwise
    caps every narrow stage (signature UDFs, band explodes, partial
    collects, per-pair verifies) at the scan's 1-2 partitions —
    measured 17 s of the 20 s sf1.0 minhash wall serialized on ≤2
    cores.  At real scale inputs have thousands of splits, so the
    condition is false and nothing is re-shuffled or collapsed.
    Deterministic-safe here: every downstream cap slices by sorted id,
    so results do not depend on the physical partitioning."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def minhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    jaccard_threshold: float = 0.7,
    ngram_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH blocking, then exact n-gram
    Jaccard verification inside blocks.  Output: (id1, id2, jaccard)."""
    d = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    d = _parallelism_floor(d)
    # word shingles: char shingles over a shared vocabulary collapse the
    # whole corpus into a handful of LSH buckets (quadratic pair blowup)
    # dedup=False: a pair colliding in k bands is verified k times (the
    # verify is one array_intersect now) and deduplicated AFTER the
    # filter — one fewer mid-path exchange, identical final pair set
    cands = lsh_candidate_pairs(
        d, "id", "text", num_hashes=num_hashes, bands=bands,
        unit="word", shingle_k=ngram_n, dedup=False,
    )
    # grams once per DOCUMENT (parallel, ~1 eval/doc), not once per
    # CANDIDATE SIDE inside the join condition (~4 interpreted
    # higher-order evals/pair, all in the probe task — guide §2.3
    # "project before the exchange" applied to an opaque expression).
    # |union| = |g1|+|g2|-|inter| for distinct arrays, so the verify
    # needs ONE array_intersect per pair and no array_union.
    g = d.select("id", word_ngrams(F.col("text"), ngram_n).alias("g"))
    t1 = g.select(F.col("id").alias("id1"), F.col("g").alias("g1"))
    t2 = g.select(F.col("id").alias("id2"), F.col("g").alias("g2"))
    inter = F.size(F.array_intersect(F.col("g1"), F.col("g2")))
    union = F.size(F.col("g1")) + F.size(F.col("g2")) - inter
    return (
        cands.join(t1, "id1")
        .join(t2, "id2")
        .withColumn(
            "jaccard",
            F.when(union == 0, F.lit(1.0)).otherwise(inter / union),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id1", "id2", "jaccard")
        .dropDuplicates(["id1", "id2"])
    )


def near_dedup_components(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Collapse near-duplicate pairs to clusters (connected components)
    and pick the min-id representative: (doc_id, cluster_id, keep)."""
    comp = connected_components(pairs, "id1", "id2")
    d = docs.select(F.col(id_col).cast("string").alias("doc_id"))
    return d.join(comp, d["doc_id"] == comp["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    ).withColumn("keep", F.col("doc_id") == F.col("cluster_id"))


# --- SimHash ------------------------------------------------------------------


@F.pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (crc32-seeded, two 32-bit
    halves), numpy-vectorized per document."""
    out = []
    for t in text:
        toks = (t or "").lower().split()
        if not toks:
            out.append(0)
            continue
        h32 = np.fromiter(
            (zlib.crc32(tok.encode("utf-8")) for tok in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        h64 = (h32 << np.uint64(32)) | np.fromiter(
            (zlib.crc32(tok.encode("utf-8"), 0x9E3779B9) for tok in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        v = np.where(bits.sum(axis=0) * 2 > len(toks), 1, 0).astype(np.uint64)
        sig = np.uint64(0)
        for i in range(64):
            sig |= v[i] << np.uint64(i)
        out.append(int(sig) - (1 << 63))  # store as signed long
    return pd.Series(out, dtype="int64")


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Pairs within Hamming distance ≤ k of the 64-bit crc32 SimHash.
    Signature computation here; the pigeonhole pair search is
    hamming_pairs.  Output: (id1, id2, hamming) with string ids."""
    sigs = _parallelism_floor(
        docs.select(F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text"))
    ).select("id", simhash64(F.col("text")).alias("sig"))
    return hamming_pairs(
        sigs, max_hamming=max_hamming, max_bucket=max_bucket, bits=64
    )


def hamming_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 200,
    bits: int = 64,
) -> DataFrame:
    """Pairs within Hamming distance ≤ k via the pigeonhole principle:
    split the ``bits``-wide signature into k+1 chunks; any pair at
    distance ≤k agrees exactly on ≥1 chunk → groupBy chunk value finds
    all of them.  ``sigs`` carries (id, sig) — any orderable id type,
    sig a long (use bits=32 for 32-bit signatures such as
    text.simhash32_signatures).

    Candidate generation is the capped groupBy-and-explode shape
    (capped_bucket_pairs), NOT a key-equality self-join: every
    empty/near-empty doc gets signature 0 and would land in ONE
    degenerate (chunk_idx, 0) bucket — quadratic pairs under a
    self-join.  The cap truncates such buckets to ``max_bucket``
    members (id-sorted, deterministic); the sig rides in the payload
    struct so no join-back is needed.  Output: (id1, id2, hamming)."""
    chunks = max_hamming + 1
    width = bits // chunks
    # chunk count is a plain Python int → unroll (shift amounts must be
    # literals for shiftrightunsigned); width=64 needs no mask (and
    # (1<<64)-1 doesn't fit a long literal)
    def chunk_val(ci: int) -> F.Column:
        shifted = F.shiftrightunsigned(F.col("sig"), ci * width)
        if width < 64:
            shifted = shifted.bitwiseAND(F.lit((1 << width) - 1))
        return shifted

    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(ci).alias("chunk_idx"),
                chunk_val(ci).alias("chunk_val"),
            )
            for ci in range(chunks)
        ]
    )
    banded = sigs.select(
        "id", "sig", F.explode(chunk_structs).alias("c")
    ).select("id", "sig", F.col("c.chunk_idx"), F.col("c.chunk_val"))
    cands = (
        capped_bucket_pairs(
            banded,
            ["chunk_idx", "chunk_val"],
            F.struct(F.col("id"), F.col("sig")),
            max_bucket=max_bucket,
        )
        .select(
            F.col("p1.id").alias("id1"),
            F.col("p2.id").alias("id2"),
            F.col("p1.sig").alias("sig1"),
            F.col("p2.sig").alias("sig2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    hamming = F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2")))
    return (
        cands.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


# --- embedding near-dup --------------------------------------------------------


def cosine_similarity_col(a: F.Column, b: F.Column) -> F.Column:
    """Cosine between two array<float/double> columns — built-in
    zip_with/aggregate, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold, blocked by BANDED
    random-hyperplane LSH: ``bands`` independent sign signatures of
    ``planes`` hyperplanes each; a pair is a candidate if it collides in
    ANY band (OR-amplification), then exact cosine filters.

    Recall math (hyperplane LSH: per-plane agreement prob 1-θ/π): at
    cosine 0.95 (θ≈0.32) one 16-plane signature catches only ~19% of
    true pairs; 8 bands × 8 planes catch 1-(1-0.43)^8 ≈ 98.9%.  A
    single wide signature is precision-biased; dedup needs recall — the
    exact cosine verify restores precision.

    Candidate generation is the capped groupBy-and-explode shape
    (capped_bucket_pairs) rather than a (band, bucket) self-join: a
    duplicate-heavy bucket (the very thing dedup looks for) or all-zero
    vectors collapsing into one signature would make the self-join
    quadratic.  Buckets are truncated at ``max_bucket`` (id-sorted,
    deterministic); vectors ride in the payload struct — bounded at
    max_bucket × dim floats per bucket — so no join-back is needed.
    Output: (id1, id2, cosine).
    """
    from powerbi_ontology_extractor_spark.operators.similarity import (
        hyperplane_bucket_udf,
    )

    e = _parallelism_floor(
        embeddings.select(
            F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("vec")
        )
    )
    # one bucket column per band (independent plane matrices via seed
    # offsets); explode into (band, bucket) rows → one shuffle
    banded = e.select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        hyperplane_bucket_udf(planes, seed + 1000 * bi)(
                            F.col("vec")
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "vec", F.col("bb.band"), F.col("bb.bucket"))
    cands = (
        capped_bucket_pairs(
            banded,
            ["band", "bucket"],
            F.struct(F.col("id"), F.col("vec")),
            max_bucket=max_bucket,
        )
        .select(
            F.col("p1.id").alias("id1"),
            F.col("p2.id").alias("id2"),
            F.col("p1.vec").alias("v1"),
            F.col("p2.vec").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cands.withColumn("cosine", cosine_similarity_col(F.col("v1"), F.col("v2")))
        .where(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
