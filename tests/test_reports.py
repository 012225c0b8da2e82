"""Driver-side report renderers (no Spark needed)."""

from powerbi_ontology_extractor_spark.functions.reports import (
    changelog_markdown,
    increment_version,
    mermaid_diagram,
    recommendations_from_conflicts,
    unified_diff_text,
)


def test_increment_version():
    assert increment_version("1.0.0") == "1.0.1"
    assert increment_version("2.9") == "2.10"
    assert increment_version("abc") == "abc.1"
    assert increment_version("1.0.x") == "1.0.x.1"


def test_recommendations():
    assert recommendations_from_conflicts([]) == [
        "No semantic conflicts detected. Good job!"
    ]
    recs = recommendations_from_conflicts(
        [
            {"conflict_type": "type_conflict", "severity": "CRITICAL"},
            {"conflict_type": "rule_conflict", "severity": "WARNING"},
        ]
    )
    assert any("critical" in r.lower() for r in recs)
    assert any("data dictionary" in r for r in recs)
    assert any("business rules" in r.lower() for r in recs)


def test_changelog_markdown():
    changes = [
        {"change_type": "added", "element_type": "entity", "element_name": "C",
         "path": "C", "old_value": None, "new_value": "type=standard, properties=1",
         "details": ""},
        {"change_type": "modified", "element_type": "property", "element_name": "x",
         "path": "A.x.data_type", "old_value": "String", "new_value": "Decimal",
         "details": "Data type changed"},
    ]
    md = changelog_markdown(changes, "v1", "v2")
    assert "# Changelog: v1 → v2" in md
    assert "## Added" in md and "## Modified" in md
    assert "`A.x.data_type`: String → Decimal" in md


def test_unified_diff():
    d = unified_diff_text(["a", "b"], ["a", "c"], "src", "tgt")
    assert "-b" in d and "+c" in d


def test_mermaid():
    nodes = [
        {"node": "ont:Ship", "node_type": "owl:Class"},
        {"node": "ont:Cust", "node_type": "owl:Class"},
    ]
    edges = [{"src": "ont:Ship", "rel": "ont:belongs_to", "dst": "ont:Cust"}]
    m = mermaid_diagram(nodes, edges)
    assert m.startswith("graph TD")
    assert 'Ship[("Ship")]' in m
    assert "Ship -->|belongs_to| Cust" in m
