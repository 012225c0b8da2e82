"""Recursive-descent DAX tokenizer: golden-coverage equivalence with the
regex parser + structural upgrades (nested CALCULATE, multi-filter
splitting, quoted table names)."""

import pytest

from powerbi_ontology_extractor_spark.functions.dax import extract_rules
from powerbi_ontology_extractor_spark.functions.dax_tokenizer import (
    extract_rules_ast,
    identify_dependencies_ast,
    parse_dax,
    tokenize,
)
from tests.test_dax_parser import GOLDEN


def test_tokenize_kinds():
    toks = tokenize('CALCULATE(SUM(Orders[Value]), Customers[Risk] > 80, X = "a b")')
    kinds = [t.kind for t in toks]
    assert kinds[0] == "ident" and toks[0].text == "CALCULATE"
    assert "bracket" in kinds and "number" in kinds and "string" in kinds


@pytest.mark.parametrize("name,dax,expect_rules,_", GOLDEN)
def test_golden_coverage_equivalence(name, dax, expect_rules, _):
    """Same has-rules outcome as the regex parser on every golden
    pattern — except bare thresholds, which are a regex-only heuristic
    (pattern 4) by design."""
    ast_rules = extract_rules_ast(name, dax)
    if name == "threshold_simple":
        assert extract_rules(name, dax) and not ast_rules
        return
    assert bool(ast_rules) == expect_rules, (name, ast_rules)


def test_nested_calculate_captures_both_levels():
    dax = 'CALCULATE(CALCULATE(SUM(Sales[Amount]), Product[Color]="Red"), Date[Year]=2024)'
    conds = {r["condition"] for r in extract_rules_ast("N", dax)}
    # regex mode sees only the inner filter; AST mode sees both
    assert any("Product[Color]" in c for c in conds)
    assert any("Date[Year]" in c for c in conds)
    assert len(extract_rules("N", dax)) == 1


def test_multi_filter_calculate_splits():
    dax = 'CALCULATE(SUM(Orders[V]), Customers[Risk] > 80, Orders[Status] = "P")'
    ast_rules = extract_rules_ast("M", dax)
    assert len(ast_rules) == 2
    assert {r["entity"] for r in ast_rules} == {"Customers", "Orders"}
    # regex mode lumps both filters into one condition
    assert len(extract_rules("M", dax)) == 1


def test_switch_pairing_ast():
    dax = ('SWITCH(TRUE(), Ship[T] > 25, "High", Ship[V] > 5, "Mid", "Low")')
    rules = extract_rules_ast("S", dax)
    assert [r["classification"] for r in rules] == ["High", "Mid"]


def test_malformed_never_throws():
    for bad in ["", "CALCULATE(", "((((", 'IF(a,b', "x > ", ") , ("]:
        assert isinstance(extract_rules_ast("X", bad), list)


def test_quoted_table_dependencies():
    deps = identify_dependencies_ast(
        "SUM('Sales Orders'[Amount]) + AVERAGE(Ship[Temp])"
    )
    assert "Sales Orders.Amount" in deps
    assert "Ship.Temp" in deps and "Ship.*" in deps


def test_parse_render_roundtrip_shape():
    node = parse_dax('IF(Orders[V] > 1000, "Big", "Small")')
    assert node.kind == "call" and node.name == "IF"
    assert node.args[0].render() == "Orders[V] > 1000"
