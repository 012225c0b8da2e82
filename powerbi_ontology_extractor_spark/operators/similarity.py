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
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket (plus Hamming-1 neighbor buckets when ``multiprobe``).

    At cluster scale the table is written bucketed by this id, so the
    probe is a partition-pruned scan instead of a full pass."""
    q = np.asarray(query_vec, dtype=float)
    m = _plane_matrix(q.shape[0], planes, seed)
    qbits = (q @ m) >= 0
    qbucket = int(qbits.dot(1 << np.arange(planes)))
    probe = [qbucket]
    if multiprobe:
        probe += [qbucket ^ (1 << i) for i in range(planes)]

    bucketed = embeddings.withColumn(
        "_bucket", hyperplane_bucket_udf(planes, seed)(F.col(vec_col))
    ).where(F.col("_bucket").isin(probe))
    return brute_force_topk(bucketed, query_vec, k, id_col, vec_col)
