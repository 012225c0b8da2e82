"""Machine-diffed golden parity: the engine's triple set vs the
REFERENCE exporter actually *running* (via tests/reference_harness) on
the reference's own conftest-style Shipment/Customer fixture
(/root/reference/tests/conftest.py:32-99) — the BASELINE P/R ≥ 0.95
gate, checked against the real thing rather than a hand-derived
reading of owl.py."""

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from tests.reference_harness import canonicalize_bnodes, reference_triples

# the reference conftest sample model (tests/conftest.py:32-99 shape)
MODEL_DATA = {
    "name": "Test Model",
    "tables": [
        {
            "name": "Shipment",
            "description": "Shipment entity",
            "columns": [
                {"name": "ShipmentID", "dataType": "string", "isKey": True,
                 "isNullable": False, "description": "Primary key"},
                {"name": "Temperature", "dataType": "double",
                 "isNullable": True, "description": "Temperature reading"},
                {"name": "Status", "dataType": "string", "isNullable": False,
                 "description": "Shipment status"},
            ],
            "measures": [
                {"name": "High Risk Shipments",
                 "expression": ("CALCULATE(COUNT(Shipment[ShipmentID]), "
                                "Shipment[Temperature] > 25)"),
                 "description": "Count of high-risk shipments"},
            ],
        },
        {
            "name": "Customer",
            "columns": [
                {"name": "CustomerID", "dataType": "string", "isKey": True,
                 "isNullable": False},
                {"name": "RiskScore", "dataType": "double",
                 "isNullable": True},
            ],
            "measures": [],
        },
    ],
    "relationships": [
        {"name": "Shipment_Customer", "fromTable": "Shipment",
         "fromColumn": "CustomerID", "toTable": "Customer",
         "toColumn": "CustomerID", "fromCardinality": "many",
         "toCardinality": "one",
         "crossFilteringBehavior": "singleDirection", "isActive": True},
    ],
    "roles": [
        {"name": "RegionalManager",
         "tablePermissions": [
             {"name": "Shipment",
              "filterExpression": "Shipment[Region] = USERNAME()"}]},
    ],
}

GENERATION_DATE = "<generation_date>"


def _mask_date(triples):
    return {
        (s, p, GENERATION_DATE if p == "ont:meta_generation_date" else o)
        for (s, p, o) in triples
    }


@pytest.fixture(scope="module")
def ref_set(tmp_path_factory):
    pbix = tmp_path_factory.mktemp("ref") / "model.pbix"
    triples, name = reference_triples(MODEL_DATA, str(pbix))
    assert name == "Test Model_Ontology"
    return _mask_date(triples), str(pbix)


@pytest.fixture(scope="module")
def engine_set(spark, ref_set):
    from powerbi_ontology_extractor_spark.operators.extract import extract_all
    from powerbi_ontology_extractor_spark.operators.ontology import (
        generate_ontology,
    )
    from powerbi_ontology_extractor_spark.operators.triples import (
        export_triples,
    )

    _, pbix_path = ref_set
    content = json.dumps(MODEL_DATA)
    sha = hashlib.sha256(content.encode()).hexdigest()
    corpus = spark.createDataFrame(
        [("r", pbix_path, "0" * 40, "model_json", content, sha)],
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string",
    )
    dfs = extract_all(corpus)
    onto = generate_ontology(dfs)
    # the reference export() emits no lineage family (north-star extra)
    t = export_triples(onto, dfs, include_lineage=False)
    rows = t.select("subj", "pred", "obj").collect()
    return _mask_date(
        canonicalize_bnodes({(r["subj"], r["pred"], r["obj"]) for r in rows})
    )


def test_reference_parity_precision_recall(ref_set, engine_set):
    ref, _ = ref_set
    eng = engine_set
    inter = ref & eng
    precision = len(inter) / len(eng)
    recall = len(inter) / len(ref)
    missing = sorted(ref - eng)
    extra = sorted(eng - ref)
    msg = (
        f"P={precision:.4f} R={recall:.4f} |ref|={len(ref)} |eng|={len(eng)}\n"
        f"missing from engine (first 15): {missing[:15]}\n"
        f"extra in engine (first 15): {extra[:15]}"
    )
    # BASELINE.json gate: P/R >= 0.95 vs the reference's own output
    assert precision >= 0.95 and recall >= 0.95, msg


def test_reference_parity_exact(ref_set, engine_set):
    """Stronger than the gate: exact set equality on this fixture.
    If this ever fails while P/R stays ≥0.95, the diff documents the
    precise divergence."""
    ref, _ = ref_set
    assert ref == engine_set, (
        f"missing: {sorted(ref - engine_set)[:20]}\n"
        f"extra: {sorted(engine_set - ref)[:20]}"
    )


# 0: wrapped JSON; 1: odd + divergent (ChurnProbability, int64 Segment,
# many-to-many Shipment rel); 3: wrapped odd; 4: EVEN + divergent
# (RiskScore combined with the divergent schema) — covers every
# generator branch pair
@pytest.mark.parametrize("repo_idx", [0, 1, 3, 4])
def test_reference_parity_corpus_models(spark, tmp_path, repo_idx):
    """Exact parity on the synthetic-corpus models too — these exercise
    SWITCH rules with colliding names (set-dedup), IF rules, RLS roles,
    hierarchies, the date/calendar quirk, and (repo 3) the
    {"model": ...} wrapper the reference PBIXReader unwraps."""
    from powerbi_ontology_extractor_spark.operators.extract import extract_all
    from powerbi_ontology_extractor_spark.operators.ontology import (
        generate_ontology,
    )
    from powerbi_ontology_extractor_spark.operators.triples import (
        export_triples,
    )
    from powerbi_ontology_extractor_spark.sources.corpus import _model_json
    import random

    content = _model_json(repo_idx, random.Random(repo_idx), 2)
    pbix = tmp_path / f"m{repo_idx}.pbix"
    ref, _name = reference_triples(json.loads(content) if repo_idx % 3 != 0
                                   else json.loads(content)["model"],
                                   str(pbix))
    ref = _mask_date(ref)

    sha = hashlib.sha256(content.encode()).hexdigest()
    corpus = spark.createDataFrame(
        [("r", str(pbix), "0" * 40, "model_json", content, sha)],
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string",
    )
    dfs = extract_all(corpus)
    onto = generate_ontology(dfs)
    t = export_triples(onto, dfs, include_lineage=False)
    eng = _mask_date(
        canonicalize_bnodes(
            {(r["subj"], r["pred"], r["obj"])
             for r in t.select("subj", "pred", "obj").collect()}
        )
    )
    assert ref == eng, (
        f"repo_idx={repo_idx}\nmissing: {sorted(ref - eng)[:20]}\n"
        f"extra: {sorted(eng - ref)[:20]}"
    )
