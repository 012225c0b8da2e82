"""Golden DAX parser behavior — the 8 coverage patterns from the
reference's evaluation harness
(/root/reference/evaluation/run_evaluation.py:158-192) plus the
rule-content goldens from its unit tests
(/root/reference/tests/test_dax_parser.py)."""

import pytest
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.functions.dax import (
    classify_measure_type,
    extract_rules,
    identify_dependencies,
    parse_measures,
)

GOLDEN = [
    # (name, dax, expect_rules, expected_type)
    ("simple_sum", "SUM(Orders[OrderValue])", False, "AGGREGATION"),
    (
        "conditional",
        "CALCULATE(DISTINCTCOUNT(Customers[CustomerID]), Customers[RiskScore] > 80)",
        True,
        "FILTER",
    ),
    (
        "switch",
        'SWITCH(TRUE(), Shipments[Temperature] > 25, "High", '
        'Shipments[Vibration] > 5, "High", '
        'Shipments[Status] = "Delayed", "Medium", "Low")',
        True,
        "CONDITIONAL",
    ),
    (
        "calculate_filter",
        "CALCULATE(SUM(Orders[OrderValue]), Customers[RiskScore] > 80, "
        'Orders[Status] = "Pending")',
        True,
        "FILTER",
    ),
    (
        "time_intelligence",
        "TOTALYTD(SUM(Orders[OrderValue]), Calendar[Date])",
        False,
        "TIME_INTELLIGENCE",
    ),
    (
        "CALCULATE_nested",
        'CALCULATE(CALCULATE(SUM(Sales[Amount]), Product[Color]="Red"), Date[Year]=2024)',
        True,
        # no >/</FILTER token → reference classifier falls through to
        # AGGREGATION (dax_parser.py:308-314)
        "AGGREGATION",
    ),
    (
        "VAR_RETURN",
        'VAR _total = SUM(Sales[Amount]) RETURN IF(_total > 100, "Big", "Small")',
        True,
        "CONDITIONAL",
    ),
    ("SUMX_iterator", "SUMX(Sales, Sales[Qty] * Sales[Price])", False, "AGGREGATION"),
    ("threshold_simple", "Score > 90", True, "CALCULATION"),
]


@pytest.mark.parametrize("name,dax,expect_rules,_", GOLDEN)
def test_golden_has_rules(name, dax, expect_rules, _):
    rules = extract_rules(name, dax)
    assert bool(rules) == expect_rules, (name, rules)


def test_calculate_filter_rule_content():
    rules = extract_rules(
        "High Risk",
        "CALCULATE(COUNT(Customers[CustomerID]), Customers[RiskScore] > 80)",
    )
    assert len(rules) == 1
    r = rules[0]
    assert r["name"] == "High Risk_Filter"
    assert r["condition"] == "Customers[RiskScore] > 80"
    assert r["action"] == "filter"
    assert r["entity"] == "Customers"
    assert r["priority"] == 1


def test_if_rule_content():
    rules = extract_rules("Size", 'IF(Orders[Value] > 1000, "Big", "Small")')
    assert len(rules) == 1
    r = rules[0]
    assert r["name"] == "Size_Condition"
    assert r["condition"] == "Orders[Value] > 1000"
    assert r["action"] == "classify_as_big"
    assert r["classification"] == "Big"
    assert r["entity"] == "Orders"


def test_switch_case_pairing():
    rules = extract_rules(
        "Risk",
        'SWITCH(TRUE(), Shipments[Temperature] > 25, "High", '
        'Shipments[Vibration] > 5, "High", '
        'Shipments[Status] = "Delayed", "Medium", "Low")',
    )
    # 3 (condition, value) pairs; trailing default "Low" unpaired
    assert len(rules) == 3
    assert rules[0]["name"] == "Risk_Switch_High"
    assert rules[0]["condition"] == "Shipments[Temperature] > 25"
    assert rules[2]["classification"] == "Medium"


def test_nested_calculate_captures_once():
    rules = extract_rules(
        "Nested",
        'CALCULATE(CALCULATE(SUM(Sales[Amount]), Product[Color]="Red"), Date[Year]=2024)',
    )
    assert len(rules) == 1
    assert rules[0]["condition"] == 'Product[Color]="Red"'


def test_threshold_guard_suppresses_duplicates():
    # IF captures "_total > 100"; bare-threshold must not re-add _total
    rules = extract_rules(
        "V", 'VAR _total = SUM(Sales[Amount]) RETURN IF(_total > 100, "Big", "Small")'
    )
    assert len(rules) == 1
    assert rules[0]["name"] == "V_Condition"


def test_threshold_entity_heuristic():
    rules = extract_rules("T", "customer_score > 50")
    assert rules[0]["entity"] == "Customer"
    rules2 = extract_rules("T", "Score > 90")
    assert rules2[0]["entity"] == ""
    assert rules2[0]["condition"] == "Score > 90"
    assert rules2[0]["action"] == "threshold_check"


def test_malformed_input_tolerated():
    assert extract_rules("X", "") == []
    assert extract_rules("X", "CALCULATE(") == []
    assert extract_rules("X", "((((") == []


@pytest.mark.parametrize("name,dax,_,expected_type", GOLDEN)
def test_measure_type_classification(spark, name, dax, _, expected_type):
    df = spark.createDataFrame([(dax,)], "f string").select(
        classify_measure_type(F.col("f")).alias("t")
    )
    assert df.first()["t"] == expected_type


def test_dependencies_jvm(spark):
    df = spark.createDataFrame(
        [("CALCULATE(SUM(Orders[OrderValue]), Customers[RiskScore] > 80)",)],
        "f string",
    ).select(identify_dependencies(F.col("f")).alias("deps"))
    deps = df.first()["deps"]
    # sorted: Table.Column pairs + Table.* refs, function stoplist applied
    assert deps == [
        "Customers.*",
        "Customers.RiskScore",
        "Orders.*",
        "Orders.OrderValue",
    ]


def test_dependencies_stoplist(spark):
    df = spark.createDataFrame(
        [("IF(Sales[Qty] > 1, 1, 0)",)], "f string"
    ).select(identify_dependencies(F.col("f")).alias("deps"))
    deps = df.first()["deps"]
    assert "IF.*" not in deps
    assert "Sales.Qty" in deps


def test_parse_measures_udf_batch(spark):
    rows = [("T", m, d) for m, d, _, _ in [(n, x, r, t) for n, x, r, t in GOLDEN]]
    df = spark.createDataFrame(
        rows, "table string, measure string, dax_formula string"
    ).withColumn("repo", F.lit("r")).withColumn("dataset", F.lit("d"))
    parsed = parse_measures(df).collect()
    by_name = {r["measure"]: r for r in parsed}
    assert len(by_name["switch"]["rules"]) == 3
    assert by_name["simple_sum"]["rules"] == []
    assert by_name["threshold_simple"]["rules"][0]["action"] == "threshold_check"
    assert by_name["time_intelligence"]["measure_type"] == "TIME_INTELLIGENCE"
