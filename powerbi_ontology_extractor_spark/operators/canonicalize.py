"""Entity canonicalization at web scale:
MinHash-LSH blocking → batched candidate scoring → connected components
(large-star/small-star) → canonical IRI assignment → triple rewrite.

The reference only groups by *exact* (normalized) name/formula
(/root/reference/powerbi_ontology/analyzer.py:98,169,253) and offers a
pairwise rename heuristic
(/root/reference/powerbi_ontology/schema_mapper.py:353-369).  At 10^12
files exact grouping misses near-duplicates and pairwise scoring is
O(n²) — so this module:

1. computes MinHash signatures over character shingles in a
   numpy-vectorized Arrow UDF (one matrix op per batch);
2. blocks candidates by LSH band buckets (groupBy — only items sharing
   a band hash are ever paired; bucket size capped against
   pathological skew);
3. scores candidate pairs with the reference's own similarity
   heuristics (containment / common-char ratio, SequenceMatcher) in a
   batched UDF — exact scoring only *inside* blocks;
4. contracts the accepted-pair graph to components with the
   large-star/small-star iterative DataFrame algorithm (Kiveris et al.,
   "Connected Components in MapReduce and Beyond", SOCC'14), local-
   checkpointing every iteration to cut lineage;
5. assigns each component the lexicographically-least member IRI as its
   canonical IRI and rewrites triples through the mapping (two hash
   joins).
"""

from __future__ import annotations

import zlib
from collections.abc import Sequence
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, DoubleType, LongType
from pyspark.sql.window import Window

_MERSENNE = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def make_minhash_udf(
    num_hashes: int = 64,
    shingle_k: int = 4,
    seed: int = 42,
    unit: str = "char",
):
    """Returns an Arrow-batched UDF: Series[str] → Series[list[long]].

    ``unit``: 'char' (character k-shingles — right for short strings
    like formulas/names) or 'word' (word k-shingles — right for
    documents, where char shingles from a shared vocabulary make
    everything look similar and LSH degenerates into one giant bucket).

    Signature math is one (num_shingles × num_hashes) numpy broadcast
    per document — no per-character Python.
    """
    a, b = _hash_params(num_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            t = (t or "").lower()
            if unit == "word":
                toks = t.split()
                if len(toks) < shingle_k:
                    shingles = {" ".join(toks)} if toks else {""}
                else:
                    shingles = {
                        " ".join(toks[i : i + shingle_k])
                        for i in range(len(toks) - shingle_k + 1)
                    }
            elif len(t) < shingle_k:
                shingles = {t} if t else {""}
            else:
                shingles = {t[i : i + shingle_k] for i in range(len(t) - shingle_k + 1)}
            x = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            sig = ((np.outer(x, a) + b) % _MERSENNE).min(axis=0)
            out.append(sig.tolist())
        return pd.Series(out)

    return minhash


def capped_bucket_pairs(
    banded: DataFrame,
    bucket_cols: Sequence[str],
    payload: F.Column,
    max_bucket: int = 200,
    salt_buckets: int = 16,
) -> DataFrame:
    """In-bucket candidate pairs with a fully memory-bounded cap.

    ``banded`` carries one row per (item, bucket); ``payload`` is a
    struct whose FIRST field is the orderable item id (extra fields ride
    along so callers need no join-back).  Per bucket the payload list is
    collected in TWO salted phases — per-(bucket, salt) sorted slice,
    then merge + final slice — so no aggregation buffer ever holds more
    than max(|bucket|/salt_buckets, salt_buckets × max_bucket) items
    even on a degenerate bucket (every empty doc hashing to one key).
    The two-phase slice is EXACTLY the single-phase result: each of the
    global ``max_bucket`` smallest ids is among the smallest in its own
    salt, so it survives phase 1, and the merge slice re-derives the
    global prefix.  Pair explosion is JVM-side; sortedness gives
    p1.id < p2.id for free.  Returns (p1, p2) struct columns; callers
    dropDuplicates on ids (an item pair can share several buckets).
    """
    salt = F.pmod(F.xxhash64(payload), F.lit(salt_buckets))
    phase1 = (
        banded.select(*bucket_cols, payload.alias("_p"), salt.alias("_salt"))
        .groupBy(*bucket_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_list("_p")), 1, max_bucket).alias("_ps"))
    )
    buckets = (
        phase1.groupBy(*bucket_cols)
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_ps"))), 1, max_bucket
            ).alias("items")
        )
        .where(F.size("items") > 1)
    )
    items = F.col("items")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(items) - 1),
            lambda i: F.transform(
                F.slice(items, i + 1, F.size(items)),
                lambda y: F.struct(
                    F.element_at(items, i).alias("p1"), y.alias("p2")
                ),
            ),
        )
    )
    return buckets.select(F.explode(pair_structs).alias("pp")).select(
        "pp.p1", "pp.p2"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    unit: str = "char",
    shingle_k: int = 4,
    dedup: bool = True,
) -> DataFrame:
    """(id1, id2) candidate pairs sharing ≥1 LSH band bucket.

    Buckets larger than ``max_bucket`` are truncated (skew guard — a
    bucket of B items emits B² pairs); the capped collect is salted
    two-phase (capped_bucket_pairs) so even a degenerate bucket never
    funnels one aggregation buffer.  Pair dedup across bands via
    dropDuplicates; ``dedup=False`` lets a caller with a cheap,
    deterministic per-pair verify defer the dedup exchange until after
    filtering (same final pair set — a pair colliding in k bands
    passes or fails the verify identically k times).
    """
    rows_per_band = num_hashes // bands
    minhash = make_minhash_udf(num_hashes, shingle_k=shingle_k, unit=unit)
    sigs = df.select(
        F.col(id_col).alias("id"), minhash(F.col(text_col)).alias("sig")
    )
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )
    pairs = capped_bucket_pairs(
        banded,
        ["band", "band_hash"],
        F.struct(F.col("id")),
        max_bucket=max_bucket,
    )
    out = pairs.select(
        F.col("p1.id").alias("id1"), F.col("p2.id").alias("id2")
    )
    return out.dropDuplicates() if dedup else out


@F.pandas_udf(BooleanType())
def similar_names_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """The reference's rename heuristic (schema_mapper.py:353-369):
    containment OR (len-diff ≤3 AND common-char ratio >0.7), batched."""

    def sim(x: str, y: str) -> bool:
        x = (x or "").lower().replace("_", "").replace("-", "")
        y = (y or "").lower().replace("_", "").replace("-", "")
        if not x or not y:
            return False
        if x in y or y in x:
            return True
        if abs(len(x) - len(y)) <= 3:
            common = sum(1 for ch in x if ch in y)
            return common / max(len(x), len(y)) > 0.7
        return False

    return pd.Series([sim(x, y) for x, y in zip(a, b)])


@F.pandas_udf(DoubleType())
def seq_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """SequenceMatcher ratio (semantic_debt.py:528-530), batched —
    only ever applied to LSH-blocked candidate pairs."""
    return pd.Series(
        [
            SequenceMatcher(None, (x or "").lower(), (y or "").lower()).ratio()
            for x, y in zip(a, b)
        ]
    )


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor strictly larger than u to
    min(Γ(u) ∪ {u})."""
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small, then connect every smaller-or-equal
    neighbor (and u itself) to min(Γ(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfs = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        nbrs.unionByName(selfs)
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
    )


def connected_components(
    edges: DataFrame, src: str = "u", dst: str = "v", max_iter: int = 25
) -> DataFrame:
    """(node, component) for the undirected graph given by ``edges``.

    Alternates large-star / small-star until the edge multiset is
    stable.  Per iteration: localCheckpoint (cuts the quadratic lineage
    that kills iterative DataFrame jobs) and an O(1)-row convergence
    aggregate (count + order-insensitive xxhash64 sum), not a join.
    Singleton inputs are the caller's concern: nodes with no accepted
    edge simply stay their own canonical.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")
    )
    all_nodes = e.select("u").unionByName(e.select(F.col("v").alias("u"))).dropDuplicates()
    e = e.localCheckpoint(eager=True)

    def fingerprint(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: overflow-safe under ANSI mode
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return row["n"], row["h"]

    prev = (-1, -1)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = fingerprint(e)
        if cur == prev:
            break
        prev = cur

    # post-state: every edge points node → component-min; close the map
    comp = e.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component"
    )
    # component representatives map to themselves; isolated nodes too
    return (
        all_nodes.join(comp, all_nodes["u"] == comp["node"], "left")
        .select(
            F.col("u").alias("node"),
            F.coalesce(F.col("component"), F.col("u")).alias("component"),
        )
    )


def entity_canonical_mapping(
    entities: DataFrame,
    properties: DataFrame,
    name_bands: int = 32,
    num_hashes: int = 64,
    min_prop_jaccard: float = 0.5,
) -> DataFrame:
    """Cross-repo entity linking → canonical IRI per entity.

    Candidate generation: LSH over ``lower(entity) || prop names``;
    acceptance: the reference's name heuristic AND property-set Jaccard
    ≥ ``min_prop_jaccard``.  Returns
    (repo, dataset, entity, entity_iri, canonical_iri).

    Band geometry: blocking recall must dominate the *acceptance*
    threshold, or near-threshold true pairs are dropped before scoring.
    With b bands of r rows the collision curve is 1-(1-s^r)^b; the
    default 32×2 puts the 50%-collision point at s≈0.17, so pairs whose
    shingle similarity is near the 0.5 acceptance bar collide with
    probability >0.999 (16×4 put the knee AT 0.5 and deterministically
    missed same-name entities differing by one property — verified by
    the exact brute-force oracle in the driver correctness gate).
    The extra bands only widen candidate generation; acceptance
    filtering is unchanged.
    """
    props = properties.groupBy("repo", "dataset", "entity").agg(
        F.array_sort(F.collect_set("property")).alias("props")
    )
    ents = (
        entities.join(props, ["repo", "dataset", "entity"], "left")
        .withColumn("props", F.coalesce(F.col("props"), F.array()))
        .select(
            F.concat_ws(
                "||", F.col("repo"), F.col("dataset"), F.col("entity")
            ).alias("id"),
            "repo",
            "dataset",
            "entity",
            F.concat(
                F.lower(F.col("entity")),
                F.lit(" "),
                F.lower(F.array_join("props", " ")),
            ).alias("blocking_text"),
            "props",
        )
    )
    cands = lsh_candidate_pairs(
        ents, "id", "blocking_text", num_hashes=num_hashes, bands=name_bands
    )
    a = ents.select(
        F.col("id").alias("id1"),
        F.col("entity").alias("name1"),
        F.col("props").alias("props1"),
    )
    b = ents.select(
        F.col("id").alias("id2"),
        F.col("entity").alias("name2"),
        F.col("props").alias("props2"),
    )
    scored = (
        cands.join(a, "id1")
        .join(b, "id2")
        .withColumn(
            "prop_jaccard",
            F.when(
                F.size(F.array_union("props1", "props2")) == 0, F.lit(1.0)
            ).otherwise(
                F.size(F.array_intersect("props1", "props2"))
                / F.size(F.array_union("props1", "props2"))
            ),
        )
        .withColumn("name_ok", similar_names_udf(F.col("name1"), F.col("name2")))
    )
    accepted = scored.where(
        F.col("name_ok") & (F.col("prop_jaccard") >= min_prop_jaccard)
    ).select("id1", "id2")
    comp = connected_components(accepted, "id1", "id2")
    mapping = ents.join(comp, ents["id"] == comp["node"], "left").select(
        "repo",
        "dataset",
        "entity",
        F.concat(F.lit("ont:"), F.translate("entity", " -.", "___")).alias(
            "entity_iri"
        ),
        F.coalesce(F.col("component"), F.col("id")).alias("canonical_key"),
    )
    return mapping.withColumn(
        "canonical_iri",
        F.concat(
            F.lit("ont:canonical_"),
            F.substring(F.sha1(F.col("canonical_key")), 1, 16),
        ),
    ).drop("canonical_key")


def rewrite_triples_canonical(
    triples: DataFrame, mapping: DataFrame
) -> DataFrame:
    """Rewrite subj/obj entity IRIs to canonical IRIs (two hash joins on
    (repo, dataset, iri); literals untouched).  Adds provenance columns
    subj_orig/obj_orig for lineage."""
    m = mapping.select(
        "repo", "dataset", F.col("entity_iri").alias("iri"), "canonical_iri"
    ).dropDuplicates(["repo", "dataset", "iri"])
    t = (
        triples.join(
            m.withColumnRenamed("iri", "subj").withColumnRenamed(
                "canonical_iri", "subj_canon"
            ),
            ["repo", "dataset", "subj"],
            "left",
        )
        .join(
            m.withColumnRenamed("iri", "obj").withColumnRenamed(
                "canonical_iri", "obj_canon"
            ),
            ["repo", "dataset", "obj"],
            "left",
        )
    )
    return t.select(
        "repo",
        "dataset",
        F.coalesce("subj_canon", "subj").alias("subj"),
        "pred",
        F.when(F.col("obj_is_literal"), F.col("obj"))
        .otherwise(F.coalesce("obj_canon", "obj"))
        .alias("obj"),
        "obj_is_literal",
        "obj_datatype",
        F.col("subj").alias("subj_orig"),
        F.col("obj").alias("obj_orig"),
    )
