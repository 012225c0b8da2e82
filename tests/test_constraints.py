"""T7/T8 constraint-triple grammar (owl.py:264-309 parity):
property constraints from suggested enhancements (range/regex) and
ontology-JSON sidecars (enum/reference/message), entity-level
EntityConstraint bnodes."""

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.pipeline import build_triples

MODEL = {
    "name": "C",
    "tables": [
        {
            "name": "Acct",
            "columns": [
                {"name": "AcctID", "dataType": "string", "isKey": True,
                 "isNullable": False},
                {"name": "Email", "dataType": "string", "isNullable": True},
                {"name": "CreditScore", "dataType": "double", "isNullable": True},
                {"name": "OwnerAge", "dataType": "int64", "isNullable": True},
            ],
        }
    ],
}

SIDECAR = {
    "dataset": "C",
    "entities": [
        {
            "name": "Acct",
            "properties": [
                {
                    "name": "Tier",
                    "constraints": [
                        {"type": "enum", "values": ["Gold", "Silver"],
                         "message": "Tier must be a known tier"},
                        {"type": "reference", "target": "TierDim"},
                    ],
                }
            ],
            "constraints": [
                {"type": "row_count", "value": "row_count > 0",
                 "message": "Acct must not be empty"}
            ],
        }
    ],
}


def _corpus(spark, docs):
    rows = []
    for path, lang, doc in docs:
        content = json.dumps(doc)
        sha = hashlib.sha256(content.encode()).hexdigest()
        rows.append(("r1", path, "0" * 40, lang, content, sha))
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string",
    )


@pytest.fixture(scope="module")
def triples(spark):
    corpus = _corpus(
        spark,
        [
            ("C.pbix/model.bim", "model_json", MODEL),
            ("C.pbix/Ontology/constraints.json", "ontology_json", SIDECAR),
        ],
    )
    t = build_triples(corpus)
    t.cache()
    return t


def _has(t, subj, pred, obj):
    return (
        t.where(
            (F.col("subj") == subj)
            & (F.col("pred") == pred)
            & (F.col("obj") == obj)
        ).count()
        == 1
    )


def test_regex_constraint_from_enhancement(triples):
    # Email → regex suggestion (ontology_generator.py:330-345)
    assert _has(
        triples, "ont:Acct_Email", "ont:pattern", r"^[^\s@]+@[^\s@]+\.[^\s@]+$"
    )


def test_range_constraints_from_enhancements(triples):
    # CreditScore → 0-100 (score), OwnerAge → 0-150 (age)
    for prop, lo, hi in [
        ("ont:Acct_CreditScore", "0", "100"),
        ("ont:Acct_OwnerAge", "0", "150"),
    ]:
        row_min = triples.where(
            (F.col("subj") == prop) & (F.col("pred") == "ont:minValue")
        ).first()
        row_max = triples.where(
            (F.col("subj") == prop) & (F.col("pred") == "ont:maxValue")
        ).first()
        # rdflib renders Literal(0, XSD.decimal) as "0", not "0.0"
        assert row_min["obj"] == lo and row_max["obj"] == hi
        assert row_min["obj_datatype"] == "xsd:decimal"
        assert row_min["obj_is_literal"]


def test_enum_constraint_posexplode(triples):
    assert _has(triples, "ont:Acct_Tier", "ont:enumValue_0", "Gold")
    assert _has(triples, "ont:Acct_Tier", "ont:enumValue_1", "Silver")
    assert (
        triples.where(F.col("pred") == "ont:enumValue_2").count() == 0
    )


def test_reference_and_message(triples):
    assert _has(triples, "ont:Acct_Tier", "ont:references", "TierDim")
    assert _has(
        triples, "ont:Acct_Tier", "ont:constraintMessage",
        "Tier must be a known tier",
    )
    # the reference constraint carries no message → exactly one
    # constraintMessage triple on Tier
    assert (
        triples.where(
            (F.col("subj") == "ont:Acct_Tier")
            & (F.col("pred") == "ont:constraintMessage")
        ).count()
        == 1
    )


def test_entity_constraint_bnode(triples):
    link = triples.where(
        (F.col("subj") == "ont:Acct") & (F.col("pred") == "ont:hasConstraint")
    ).collect()
    assert len(link) == 1
    bnode = link[0]["obj"]
    assert bnode.startswith("_:ec_")
    assert _has(triples, bnode, "rdf:type", "ont:EntityConstraint")
    assert _has(triples, bnode, "ont:constraintType", "row_count")
    assert _has(triples, bnode, "ont:constraintValue", "row_count > 0")
    assert _has(triples, bnode, "rdfs:comment", "Acct must not be empty")


def test_constraint_family_arithmetic(triples):
    """Exact family counts for this corpus: enhancements emit
    1 pattern + 2×(min+max); sidecar emits 2 enumValue_<i> + 1
    references + 1 message; entity constraint emits 5."""
    counts = {
        r["pred"]: r["n"]
        for r in triples.where(
            F.col("pred").isin(
                "ont:pattern", "ont:minValue", "ont:maxValue",
                "ont:enumValue_0", "ont:enumValue_1", "ont:references",
                "ont:constraintMessage", "ont:hasConstraint",
                "ont:constraintType", "ont:constraintValue",
            )
        )
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {
        "ont:pattern": 1,
        "ont:minValue": 2,
        "ont:maxValue": 2,
        "ont:enumValue_0": 1,
        "ont:enumValue_1": 1,
        "ont:references": 1,
        "ont:constraintMessage": 1,
        "ont:hasConstraint": 1,
        "ont:constraintType": 1,
        "ont:constraintValue": 1,
    }
