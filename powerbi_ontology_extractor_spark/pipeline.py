"""End-to-end KG-construction pipeline: corpus → triples (+ node/edge).

Mirrors the reference's `extract → generate → export` lifecycle
(/root/reference/powerbi_ontology/cli.py:63-106) as one lazy DataFrame
DAG: the whole corpus is one job, per-artifact failure isolation is the
permissive `from_json` (bad JSON → null struct → zero rows emitted,
never a thrown task), and the thread-pool batch loop
(cli.py:108-157) is simply cluster parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.functions.layout import report_triples
from powerbi_ontology_extractor_spark.functions.mquery import m_datasource_triples
from powerbi_ontology_extractor_spark.operators.extract import extract_all
from powerbi_ontology_extractor_spark.operators.ontology import generate_ontology
from powerbi_ontology_extractor_spark.operators.constraints_io import (
    enhancement_property_constraints,
    sidecar_entity_constraints,
    sidecar_property_constraints,
)
from powerbi_ontology_extractor_spark.operators.triples import (
    DEFAULT_GENERATED_AT,
    DEFAULT_ROLES,
    TRIPLE_COLS,
    entity_constraint_triples,
    export_summary,
    export_triples,
    property_constraint_triples,
)


def _constraint_triples(corpus: DataFrame, onto_dfs: dict) -> DataFrame:
    """T7/T8 constraint families (owl.py:264-309): suggested validation
    constraints (ontology_generator.py:314-366 heuristics, applied as
    the reference's include_constraints=True export does) plus
    ontology-JSON sidecar constraints (the mcp_server.py:268-296 load
    path) including entity-level EntityConstraint bnodes."""
    pcs = enhancement_property_constraints(
        onto_dfs["enhancements"]
    ).unionByName(sidecar_property_constraints(corpus))
    return property_constraint_triples(pcs).unionByName(
        entity_constraint_triples(sidecar_entity_constraints(corpus))
    )


def build_triples(
    corpus: DataFrame,
    roles: list[str] = DEFAULT_ROLES,
    generated_at: str = DEFAULT_GENERATED_AT,
    include_latent_surfaces: bool = True,
) -> DataFrame:
    """corpus (repo, path, commit, lang, content) → triples DF."""
    # materialize stage boundaries: the export union fans out into ~40
    # branches; without barriers every branch re-derives the parse
    # (measured 6x wall-clock at local[32])
    model_dfs = extract_all(corpus, materialize=True)
    onto_dfs = generate_ontology(model_dfs, materialize=True)
    triples = export_triples(onto_dfs, model_dfs, roles, generated_at, dedup=False)
    triples = triples.unionByName(_constraint_triples(corpus, onto_dfs))
    if include_latent_surfaces:
        triples = triples.unionByName(
            m_datasource_triples(corpus, model_dfs["datasets"])
        ).unionByName(report_triples(corpus, model_dfs["datasets"]))
    return triples.dropDuplicates(TRIPLE_COLS)


def build_triples_canonicalized(
    corpus: DataFrame,
    roles: list[str] = DEFAULT_ROLES,
    generated_at: str = DEFAULT_GENERATED_AT,
    min_prop_jaccard: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Full north-star path: triples + cross-repo entity canonicalization
    (MinHash-LSH blocking → connected components → canonical IRIs)
    applied BEFORE node/edge materialization.

    Returns (canonical_triples, mapping).  Canonical triples carry
    subj_orig/obj_orig provenance columns.
    """
    from powerbi_ontology_extractor_spark.operators.canonicalize import (
        entity_canonical_mapping,
        rewrite_triples_canonical,
    )

    model_dfs = extract_all(corpus, materialize=True)
    onto_dfs = generate_ontology(model_dfs, materialize=True)
    triples = export_triples(onto_dfs, model_dfs, roles, generated_at, dedup=False)
    triples = (
        triples.unionByName(_constraint_triples(corpus, onto_dfs))
        .unionByName(m_datasource_triples(corpus, model_dfs["datasets"]))
        .unionByName(report_triples(corpus, model_dfs["datasets"]))
    )
    triples = triples.dropDuplicates(TRIPLE_COLS)
    mapping = entity_canonical_mapping(
        onto_dfs["ontology_entities"],
        model_dfs["properties"],
        min_prop_jaccard=min_prop_jaccard,
    )
    return rewrite_triples_canonical(triples, mapping), mapping


def nodes_edges(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Materialize the graph as node/edge tables (north-star output;
    replaces the reference's networkx DiGraph at
    utils/visualizer.py:39-68).

    nodes: every URI subject/object with its rdf:type (if any)
    edges: every URI→URI triple (non-literal objects)
    """
    uri_objs = triples.where(~F.col("obj_is_literal"))
    nodes = (
        triples.select("repo", "dataset", F.col("subj").alias("node"))
        .unionByName(
            uri_objs.select("repo", "dataset", F.col("obj").alias("node"))
        )
        .dropDuplicates()
        .join(
            triples.where(F.col("pred") == "rdf:type")
            .groupBy("repo", "dataset", F.col("subj").alias("node"))
            .agg(F.min("obj").alias("node_type")),
            ["repo", "dataset", "node"],
            "left",
        )
    )
    edges = uri_objs.select(
        "repo",
        "dataset",
        F.col("subj").alias("src"),
        F.col("pred").alias("rel"),
        F.col("obj").alias("dst"),
    )
    return nodes, edges


def write_outputs(triples: DataFrame, out_dir: str, repo_buckets: int = 64) -> None:
    """Persist triples + node/edge tables.

    Cluster posture: Iceberg tables partitioned by ``bucket(repo)``;
    locally parquet with an explicit repartition on the same key so the
    file layout matches what a 1000-executor write would produce.
    """
    t = triples.repartition(repo_buckets, "repo")
    t.write.mode("overwrite").parquet(f"{out_dir}/triples")
    nodes, edges = nodes_edges(triples)
    nodes.repartition(max(repo_buckets // 4, 1), "repo").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/nodes")
    edges.repartition(max(repo_buckets // 4, 1), "repo").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/edges")


__all__ = [
    "build_triples",
    "nodes_edges",
    "write_outputs",
    "export_summary",
]
