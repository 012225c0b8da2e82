"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k — the correctness baseline: one narrow map
  (JVM zip_with/aggregate dot product) + top-k (orderBy/limit or a
  window per query).  At 100 TB this is the fallback for small query
  batches, scanning once per batch.
- LSH-bucketed ANN — random-hyperplane sign buckets; the query probes
  its own bucket (and optionally multi-probes neighbors at Hamming
  distance 1).  Recall/latency knob = number of planes.

An IVF variant would swap the hash for learned centroids; the bucket
plumbing (partition by bucket id, probe subset) is identical, so the
LSH path is the scale blueprint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from powerbi_ontology_extractor_spark.operators.dedup import (
    cosine_similarity_col,
)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector.  The dot product is
    a built-in expression (whole-stage codegen); top-k is a global
    orderBy+limit (Spark runs TakeOrderedAndProject — no full sort)."""
    q = F.lit(np.asarray(query_vec, dtype=float).tolist()).cast(
        "array<double>"
    )
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_similarity_col(F.col(vec_col), q), 9).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _plane_matrix(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, planes))


def hyperplane_bucket_udf(planes: int = 16, seed: int = 42):
    """Arrow UDF: vector → int bucket id (sign pattern across random
    hyperplanes).  The plane matrix is built lazily from the first
    batch's dimensionality and cached per worker."""

    state: dict[int, np.ndarray] = {}

    @F.pandas_udf(IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        out = []
        for v in vec:
            if v is None or len(v) == 0:
                out.append(-1)
                continue
            arr = np.asarray(v, dtype=float)
            m = state.get(arr.shape[0])
            if m is None:
                m = _plane_matrix(arr.shape[0], planes, seed)
                state[arr.shape[0]] = m
            bits = (arr @ m) >= 0
            out.append(int(bits.dot(1 << np.arange(planes))))
        return pd.Series(out, dtype="int32")

    return bucket


def _probe_buckets(
    query_vec: list[float], planes: int, seed: int, multiprobe: bool
) -> list[int]:
    q = np.asarray(query_vec, dtype=float)
    m = _plane_matrix(q.shape[0], planes, seed)
    qbits = (q @ m) >= 0
    qbucket = int(qbits.dot(1 << np.arange(planes)))
    probe = [qbucket]
    if multiprobe:
        probe += [qbucket ^ (1 << i) for i in range(planes)]
    return probe


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with the bucket id computed on the fly — the
    BUILDER path (one full scan).  For repeated queries at scale use
    :func:`write_bucketed` + :func:`lsh_topk_bucketed`, which probe a
    partition-pruned layout instead of rescanning."""
    probe = _probe_buckets(query_vec, planes, seed, multiprobe)
    bucketed = embeddings.withColumn(
        "_bucket", hyperplane_bucket_udf(planes, seed)(F.col(vec_col))
    ).where(F.col("_bucket").isin(probe))
    return brute_force_topk(bucketed, query_vec, k, id_col, vec_col)


def write_bucketed(
    embeddings: DataFrame,
    path: str,
    planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> str:
    """Materialize the ANN index layout: one parquet partition directory
    per hyperplane bucket (``bucket=<id>/``).  The bucket UDF runs ONCE
    at build time; every subsequent probe is a partition-pruned scan of
    ~(multiprobe+1)/2^planes of the data — the scan never touches
    non-probed buckets' files.  On a cluster this is the same layout as
    an Iceberg table partitioned by the bucket id."""
    (
        embeddings.withColumn(
            "bucket", hyperplane_bucket_udf(planes, seed)(F.col(vec_col))
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    return path


def _centroid_assign_udf(centroids: np.ndarray):
    """Arrow UDF: vector → nearest-centroid id by cosine (centroids are
    row-normalized, so argmax of the dot product)."""
    norm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def assign(vec: pd.Series) -> pd.Series:
        out = []
        for v in vec:
            if v is None or len(v) == 0:
                out.append(-1)
                continue
            a = np.asarray(v, dtype=float)
            n = np.linalg.norm(a)
            out.append(int(np.argmax(norm @ (a / n))) if n else -1)
        return pd.Series(out, dtype="int32")

    return assign


def ivf_build(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 64,
    train_sample: int = 10_000,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """IVF index: k-means centroids trained on a deterministic sample
    (standard IVF practice — training is sample-sized, ASSIGNMENT is
    distributed), then the table written partitioned by centroid id.
    Centroids persist beside the data as a tiny parquet sidecar
    (``<path>_centroids``) written/read through Spark — works on any
    Hadoop-compatible filesystem (HDFS/S3/local), unlike a driver-local
    ``open()``.  Swapping the LSH bucket for learned centroids reuses
    the identical layout/probe plumbing — this is the promised IVF
    variant of the scale path."""
    sample = np.array(
        embeddings.select(vec_col)
        .orderBy(id_col)
        .limit(train_sample)
        .rdd.map(lambda r: r[0])
        .collect(),
        dtype=float,
    )
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                              replace=False)]
    for _ in range(iters):  # spherical k-means (cosine)
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / np.linalg.norm(m)
    (
        embeddings.withColumn(
            "centroid", _centroid_assign_udf(cents)(F.col(vec_col))
        )
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(path)
    )
    spark = embeddings.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(_centroids_path(path))
    return path


def _centroids_path(path: str) -> str:
    """Sidecar location: a sibling directory, NOT inside ``path`` —
    Spark ignores ``_``-prefixed files but a nested parquet dir would
    confuse partition discovery on some filesystems."""
    return path.rstrip("/") + "_centroids"


def read_centroids(spark, path: str) -> np.ndarray:
    """Load the IVF centroid matrix from the parquet sidecar (through
    the session's filesystem, not the driver's local disk)."""
    rows = spark.read.parquet(_centroids_path(path)).orderBy(
        "centroid_id"
    ).collect()
    return np.array([r["centroid"] for r in rows], dtype=float)


def ivf_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest inverted lists (partition-pruned
    scan), then exact cosine top-k inside them."""
    cents = read_centroids(spark, path)
    q = np.asarray(query_vec, dtype=float)
    q = q / np.linalg.norm(q)
    probe = [int(i) for i in np.argsort(-(cents @ q))[:nprobe]]
    df = spark.read.parquet(path).where(F.col("centroid").isin(probe))
    return brute_force_topk(df, query_vec, k, id_col, vec_col)


def lsh_topk_bucketed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a :func:`write_bucketed` layout: the ``bucket IN (...)``
    filter prunes at the partition level (visible as PartitionFilters in
    the scan node) — no bucket UDF, no full pass."""
    probe = _probe_buckets(query_vec, planes, seed, multiprobe)
    df = spark.read.parquet(path).where(F.col("bucket").isin(probe))
    return brute_force_topk(df, query_vec, k, id_col, vec_col)
