"""DAX subset parser: business-rule mention detection over content batches.

Semantics contract = the reference's regex subset parser
(/root/reference/powerbi_ontology/dax_parser.py:112-317), verified
against its 8 golden patterns (evaluation/run_evaluation.py:158-192):

  1. CALCULATE(expr, filter)   — single level; nesting captures outer
  2. IF(cond, true, false)     — classification rules
  3. SWITCH(TRUE(), c1, v1, …) — case pairing by comma split, step 2
  4. field > threshold          — guarded: skip fields already captured

Split of work:
- rule extraction  → Arrow-batched pandas UDF (regex state machine per
  batch; no row-at-a-time Spark Python UDF)
- measure-type classification (D9) and dependency identification (D8)
  → native Spark expressions (whole-stage codegen, never leave the JVM)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# --- compiled once per executor python worker -------------------------------
_CALC = re.compile(r"CALCULATE\s*\([^,]+,\s*([^)]+)\)", re.IGNORECASE)
_IF = re.compile(r"IF\s*\(\s*([^,]+),\s*([^,]+),\s*([^)]+)\)", re.IGNORECASE)
_SWITCH = re.compile(r"SWITCH\s*\([^,]+,\s*([^)]+)\)", re.IGNORECASE)
_THRESHOLD = re.compile(r"(\w+)\s*(>|<|>=|<=|=)\s*(\d+\.?\d*)")
_ENTITY = re.compile(r"(\w+)\[")
_WS = re.compile(r"\s+")

RULE_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("condition", StringType()),
        StructField("action", StringType()),
        StructField("classification", StringType()),
        StructField("description", StringType()),
        StructField("entity", StringType()),
        StructField("priority", IntegerType()),
    ]
)
RULES_ARRAY = ArrayType(RULE_SCHEMA)


def _norm_condition(cond: str) -> str | None:
    cond = _WS.sub(" ", cond.strip())
    return cond or None


def _entity_of(cond: str) -> str:
    m = _ENTITY.search(cond)
    return m.group(1) if m else ""


def _entity_of_field(field: str) -> str:
    if "_" in field:
        return field.split("_")[0].capitalize()
    return ""


def _clean_value(v: str) -> str:
    return v.replace('"', "").replace(" ", "_")


def extract_rules(measure_name: str, dax: str) -> list[dict]:
    """Pure-python core (one formula → rule dicts); exercised directly
    by the golden-pattern unit tests and batched by the UDF below."""
    rules: list[dict] = []

    def add(name, condition, action, classification, description, entity):
        rules.append(
            {
                "name": name,
                "condition": condition,
                "action": action,
                "classification": classification,
                "description": description,
                "entity": entity,
                "priority": 1,
            }
        )

    for m in _CALC.finditer(dax):
        cond = _norm_condition(m.group(1))
        if cond:
            add(
                f"{measure_name}_Filter",
                cond,
                "filter",
                "",
                f"Filter condition from {measure_name}: {cond}",
                _entity_of(cond),
            )

    for m in _IF.finditer(dax):
        raw_cond, true_v, false_v = (m.group(i).strip() for i in (1, 2, 3))
        cond = _norm_condition(raw_cond)
        if cond:
            add(
                f"{measure_name}_Condition",
                cond,
                f"classify_as_{_clean_value(true_v).lower()}",
                true_v.replace('"', "").strip(),
                f"IF condition: {cond} then {true_v} else {false_v}",
                _entity_of(raw_cond),
            )

    for m in _SWITCH.finditer(dax):
        parts = [p.strip() for p in m.group(1).split(",")]
        for i in range(0, len(parts) - 1, 2):
            case_cond, case_v = parts[i], parts[i + 1]
            cond = _norm_condition(case_cond)
            if cond:
                add(
                    f"{measure_name}_Switch_{_clean_value(case_v)}",
                    cond,
                    f"classify_as_{_clean_value(case_v).lower()}",
                    case_v.replace('"', "").strip(),
                    f"SWITCH case: {cond} -> {case_v}",
                    _entity_of(case_cond),
                )

    for m in _THRESHOLD.finditer(dax):
        field, op, val = m.group(1), m.group(2), m.group(3)
        if not any(field in r["condition"] for r in rules):
            add(
                f"{measure_name}_Threshold",
                f"{field} {op} {val}",
                "threshold_check",
                "",
                f"Threshold condition: {field} {op} {val}",
                _entity_of_field(field),
            )

    return rules


@F.pandas_udf(RULES_ARRAY)
def extract_rules_udf(name: pd.Series, dax: pd.Series) -> pd.Series:
    """Arrow-batched rule extraction: Series[str] × Series[str] →
    Series[list[Row]].  One Python invocation per ~512-row batch."""
    out = [
        extract_rules(n if n is not None else "", d if d is not None else "")
        for n, d in zip(name, dax)
    ]
    return pd.Series(out)


# --- JVM-side pieces ---------------------------------------------------------

_DAX_FUNCTION_STOPLIST = ["IF", "CALCULATE", "SUM", "COUNT", "AVG", "MAX", "MIN"]


def identify_dependencies(formula: Column) -> Column:
    """Table/column dependency set "Table.Column" ∪ "Table.*", sorted.

    Reference semantics: dax_parser.py:262-287 — plain ``(\\w+)[(\\w+)]``
    pairs plus capitalized table-only refs with a function stoplist.
    Pure Spark expressions; arrays zipped by match index.
    """
    pat = r"(\w+)\[(\w+)\]"
    tables = F.regexp_extract_all(formula, F.lit(pat), 1)
    columns = F.regexp_extract_all(formula, F.lit(pat), 2)
    pairs = F.transform(
        F.arrays_zip(tables.alias("t"), columns.alias("c")),
        lambda x: F.concat(x["t"], F.lit("."), x["c"]),
    )
    table_only = F.regexp_extract_all(
        formula, F.lit(r"\b([A-Z][a-zA-Z0-9_]*)\["), 1
    )
    table_refs = F.transform(
        F.filter(
            table_only,
            lambda t: ~F.upper(t).isin(_DAX_FUNCTION_STOPLIST),
        ),
        lambda t: F.concat(t, F.lit(".*")),
    )
    return F.array_sort(F.array_distinct(F.concat(pairs, table_refs)))


_TIME_INTEL = ["DATEADD", "TOTALYTD", "TOTALQTD", "TOTALMTD", "SAMEPERIODLASTYEAR"]
_AGGS = ["SUM", "COUNT", "AVG", "AVERAGE", "MAX", "MIN", "DISTINCTCOUNT"]


def classify_measure_type(formula: Column) -> Column:
    """Measure-type precedence chain (dax_parser.py:289-317), including
    its *substring* semantics ('IF' in upper(dax) — not word-bounded)."""
    up = F.upper(formula)

    def any_contains(keywords: list[str]) -> Column:
        cond = F.lit(False)
        for k in keywords:
            cond = cond | up.contains(k)
        return cond

    return (
        F.when(any_contains(_TIME_INTEL), "TIME_INTELLIGENCE")
        .when(up.contains("IF") | up.contains("SWITCH"), "CONDITIONAL")
        .when(
            up.contains("CALCULATE")
            & (
                up.contains("FILTER")
                | formula.contains(">")
                | formula.contains("<")
            ),
            "FILTER",
        )
        .when(any_contains(_AGGS), "AGGREGATION")
        .otherwise("CALCULATION")
    )


def parse_measures(measures: pd.DataFrame):
    """measures DF (… measure, dax_formula …) → + measure_type,
    lineage_deps, rules columns.  The only Python in the plan is the
    rules UDF; type/deps stay in codegen."""
    return (
        measures.withColumn(
            "measure_type", classify_measure_type(F.col("dax_formula"))
        )
        .withColumn("lineage_deps", identify_dependencies(F.col("dax_formula")))
        .withColumn(
            "rules", extract_rules_udf(F.col("measure"), F.col("dax_formula"))
        )
    )
