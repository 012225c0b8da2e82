"""Canonicalization: connected components vs a union-find oracle,
MinHash-LSH blocking behavior, end-to-end entity linking + rewrite."""

import random

import pytest
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.operators.canonicalize import (
    connected_components,
    entity_canonical_mapping,
    lsh_candidate_pairs,
    rewrite_triples_canonical,
    similar_names_udf,
)


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return {frozenset(g) for g in groups.values()}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "u string, v string")
    result = connected_components(df).collect()
    groups = {}
    for r in result:
        groups.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(g) for g in groups.values()}, result


def test_cc_simple_chain(spark):
    parts, result = _spark_components(
        spark, [("b", "a"), ("c", "b"), ("d", "c"), ("x", "y")]
    )
    assert parts == {frozenset({"a", "b", "c", "d"}), frozenset({"x", "y"})}
    # representative is the lexicographic min
    comp_of = {r["node"]: r["component"] for r in result}
    assert comp_of["d"] == "a" and comp_of["y"] == "x"


def test_cc_self_loop_and_duplicate_edges(spark):
    parts, _ = _spark_components(
        spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")]
    )
    assert parts == {frozenset({"a", "b"})}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_random_vs_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _union_find_components(edges, {n for e in edges for n in e})
    actual, _ = _spark_components(spark, edges)
    assert actual == expected


def test_lsh_blocks_near_duplicates(spark):
    docs = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy dogs"),  # near-dup of a
        ("c", "completely different content about spark dataframes"),
    ]
    df = spark.createDataFrame(docs, "id string, text string")
    pairs = {
        (r["id1"], r["id2"])
        for r in lsh_candidate_pairs(df, "id", "text", num_hashes=64, bands=16).collect()
    }
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_similar_names_heuristic(spark):
    rows = [
        ("Customer", "Customers"),       # containment
        ("warehouse_location", "warehouselocation"),  # containment after strip
        ("Revenue", "Profit"),           # not similar
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    res = [r["s"] for r in df.select(similar_names_udf("a", "b").alias("s")).collect()]
    assert res == [True, True, False]


@pytest.fixture(scope="module")
def linked(spark):
    entities = spark.createDataFrame(
        [
            ("r1", "D1", "Customer", "", "Customer", "CustomerID", 3, "standard"),
            ("r2", "D2", "Customers", "", "Customers", "CustomerID", 3, "standard"),
            ("r3", "D3", "Product", "", "Product", "ProductID", 2, "standard"),
        ],
        "repo string, dataset string, entity string, description string, "
        "source_table string, primary_key string, n_properties int, entity_type string",
    )
    props = spark.createDataFrame(
        [
            ("r1", "D1", "Customer", "CustomerID"),
            ("r1", "D1", "Customer", "Name"),
            ("r1", "D1", "Customer", "RiskScore"),
            ("r2", "D2", "Customers", "CustomerID"),
            ("r2", "D2", "Customers", "Name"),
            ("r2", "D2", "Customers", "Segment"),
            ("r3", "D3", "Product", "ProductID"),
            ("r3", "D3", "Product", "Price"),
        ],
        "repo string, dataset string, entity string, property string",
    )
    return entity_canonical_mapping(entities, props).collect()


def test_entity_linking_merges_near_duplicates(linked):
    by_entity = {r["entity"]: r for r in linked}
    assert (
        by_entity["Customer"]["canonical_iri"]
        == by_entity["Customers"]["canonical_iri"]
    )
    assert (
        by_entity["Product"]["canonical_iri"]
        != by_entity["Customer"]["canonical_iri"]
    )


def test_rewrite_triples(spark, linked):
    mapping = spark.createDataFrame(linked)
    triples = spark.createDataFrame(
        [
            ("r1", "D1", "ont:Customer", "rdf:type", "owl:Class", False, ""),
            ("r2", "D2", "ont:Customers", "rdf:type", "owl:Class", False, ""),
            ("r1", "D1", "ont:X", "ont:appliesTo", "ont:Customer", False, ""),
            ("r1", "D1", "ont:Customer", "rdfs:label", "Customer", True, ""),
        ],
        "repo string, dataset string, subj string, pred string, obj string, "
        "obj_is_literal boolean, obj_datatype string",
    )
    out = rewrite_triples_canonical(triples, mapping).collect()
    subj_of = {(r["repo"], r["subj_orig"]): r["subj"] for r in out}
    # both repos' Customer IRIs rewritten to the SAME canonical IRI
    assert subj_of[("r1", "ont:Customer")] == subj_of[("r2", "ont:Customers")]
    assert subj_of[("r1", "ont:Customer")].startswith("ont:canonical_")
    # object URI rewritten; literal object untouched
    by = {(r["repo"], r["pred"]): r for r in out}
    assert by[("r1", "ont:appliesTo")]["obj"].startswith("ont:canonical_")
    assert by[("r1", "rdfs:label")]["obj"] == "Customer"
