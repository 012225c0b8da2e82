"""Deterministic synthetic artifact corpus in the engine's input shape.

The engine's only input is a table
``(repo, path, commit, lang, content, content_sha256)`` — one row per
artifact file, ``lang`` discriminating the parser
(``model_json | dax | m | report_json``).  This module synthesizes such
a corpus deterministically (seeded, no wall-clock, no host randomness)
so correctness tests, golden-triple tests and the scaling bench all run
on reproducible data at any scale.

Shapes mirror the reference's own test fixtures:
- model JSON: /root/reference/tests/conftest.py:32-99 (Shipment/Customer
  star) generalized to a Calendar/Customer/Product/Orders/Shipment/
  Returns schema that exercises every pattern detector
  (date: ontology_generator.py:271-284, dimension :287-297,
  fact :299-310).
- DAX corpus: /root/reference/tests/fixtures/test_data.py:6-37 and
  /root/reference/evaluation/run_evaluation.py:158-192 (8 golden
  patterns).
- conflict fixture: /root/reference/tests/conftest.py:290-333 — the
  same measure name defined over RiskScore>80 in even repos and
  ChurnProbability>0.7 in odd repos; Customer carries a different
  property set accordingly.

Skew: one "mega-dashboard" repo gets ``mega_factor``× the median
measure count, to exercise AQE skew handling / salting downstream.
"""

from __future__ import annotations

import hashlib
import json
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
        StructField("content_sha256", StringType(), False),
    ]
)

# The 8 golden DAX patterns + 1 threshold (evaluation/run_evaluation.py:158-192)
GOLDEN_DAX = [
    ("Orders", "simple_sum", "SUM(Orders[OrderValue])"),
    (
        "Customer",
        "conditional",
        "CALCULATE(DISTINCTCOUNT(Customers[CustomerID]), Customers[RiskScore] > 80)",
    ),
    (
        "Shipment",
        "switch",
        'SWITCH(TRUE(), Shipments[Temperature] > 25, "High", '
        'Shipments[Vibration] > 5, "High", '
        'Shipments[Status] = "Delayed", "Medium", "Low")',
    ),
    (
        "Orders",
        "calculate_filter",
        "CALCULATE(SUM(Orders[OrderValue]), Customers[RiskScore] > 80, "
        'Orders[Status] = "Pending")',
    ),
    (
        "Orders",
        "time_intelligence",
        "TOTALYTD(SUM(Orders[OrderValue]), Calendar[Date])",
    ),
    (
        "Sales",
        "CALCULATE_nested",
        'CALCULATE(CALCULATE(SUM(Sales[Amount]), Product[Color]="Red"), Date[Year]=2024)',
    ),
    (
        "Sales",
        "VAR_RETURN",
        'VAR _total = SUM(Sales[Amount]) RETURN IF(_total > 100, "Big", "Small")',
    ),
    ("Sales", "SUMX_iterator", "SUMX(Sales, Sales[Qty] * Sales[Price])"),
    ("Scores", "threshold_simple", "Score > 90"),
]


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def _commit(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(40))


def _model_json(repo_idx: int, rng: random.Random, n_extra_measures: int) -> str:
    """One Power BI `model.bim`-shaped JSON document."""
    even = repo_idx % 2 == 0
    risk_col = (
        {"name": "RiskScore", "dataType": "double", "isNullable": True,
         "description": "Customer risk score"}
        if even
        else {"name": "ChurnProbability", "dataType": "double", "isNullable": True,
              "description": "Churn probability"}
    )
    conflict_expr = (
        "CALCULATE(COUNT(Customer[CustomerID]), Customer[RiskScore] > 80)"
        if even
        else "CALCULATE(COUNT(Customer[CustomerID]), Customer[ChurnProbability] > 0.7)"
    )
    # deterministic cross-repo schema disagreements (the
    # SemanticDebtAnalyzer families of the reference's
    # semantic_debt.py:388-460 need real conflicts to be non-vacuous):
    # every third repo types Customer.Segment as int64 instead of
    # string (A8 property-type conflict, always CRITICAL) and models
    # Shipment→Customer as many-to-many instead of many-to-one
    # (A9 relationship-cardinality conflict, WARNING)
    divergent = repo_idx % 3 == 1
    seg_type = "int64" if divergent else "string"
    ship_to_card = "many" if divergent else "one"
    extra_measures = [
        {
            "name": f"Metric {j}",
            "expression": (
                f"CALCULATE(SUM(Orders[OrderValue]), Orders[OrderValue] > {100 + 10 * j})"
            ),
            "displayFolder": "Auto",
            "description": f"Auto metric {j}",
        }
        for j in range(n_extra_measures)
    ]
    model = {
        "name": f"Dashboard {repo_idx}",
        "tables": [
            {
                "name": "Calendar",
                "description": "Date dimension",
                "columns": [
                    {"name": "Date", "dataType": "datetime", "isKey": True,
                     "isNullable": False},
                    {"name": "Year", "dataType": "int64", "isNullable": False},
                    {"name": "Month", "dataType": "int64", "isNullable": False},
                    {"name": "Day", "dataType": "int64", "isNullable": False},
                ],
                "hierarchies": [
                    {"name": "Calendar Hierarchy",
                     "levels": [{"name": "Year"}, {"name": "Month"}, {"name": "Day"}]}
                ],
            },
            {
                "name": "Customer",
                "description": "Customer dimension",
                "columns": [
                    {"name": "CustomerID", "dataType": "string", "isKey": True,
                     "isNullable": False, "description": "Primary key"},
                    {"name": "CustomerName", "dataType": "string", "isNullable": True},
                    risk_col,
                    {"name": "Segment", "dataType": seg_type, "isNullable": True},
                    {"name": "Email", "dataType": "string", "isNullable": True},
                    {"name": "Website", "dataType": "string", "isNullable": True},
                ],
            },
            {
                "name": "Product",
                "description": "Product dimension",
                "columns": [
                    {"name": "ProductID", "dataType": "string", "isKey": True,
                     "isNullable": False},
                    {"name": "ProductName", "dataType": "string", "isNullable": True},
                    {"name": "Category", "dataType": "string", "isNullable": True},
                    {"name": "UnitPrice", "dataType": "double", "isNullable": True},
                ],
                "hierarchies": [
                    {"name": "Product Hierarchy",
                     "levels": [{"name": "Category"}, {"name": "ProductName"}]}
                ],
            },
            {
                "name": "Orders",
                "description": "Order fact table",
                "columns": [
                    {"name": "OrderID", "dataType": "string", "isKey": True,
                     "isNullable": False},
                    {"name": "CustomerID", "dataType": "string", "isNullable": False},
                    {"name": "ProductID", "dataType": "string", "isNullable": False},
                    {"name": "OrderDate", "dataType": "datetime", "isNullable": False},
                    {"name": "OrderValue", "dataType": "double", "isNullable": True},
                    {"name": "Status", "dataType": "string", "isNullable": True},
                ],
                "measures": [
                    {
                        "name": "Total Order Value",
                        "expression": "SUM(Orders[OrderValue])",
                        "displayFolder": "Core",
                        "description": "Sum of order values",
                    },
                    {
                        "name": "Order Size Class",
                        "expression": 'IF(Orders[OrderValue] > 1000, "Big", "Small")',
                        "displayFolder": "Core",
                        "description": "",
                    },
                    *extra_measures,
                ],
            },
            {
                "name": "Shipment",
                "description": "Shipment fact table",
                "columns": [
                    {"name": "ShipmentID", "dataType": "string", "isKey": True,
                     "isNullable": False, "description": "Primary key"},
                    {"name": "CustomerID", "dataType": "string", "isNullable": False},
                    {"name": "Temperature", "dataType": "double", "isNullable": True},
                    {"name": "Vibration", "dataType": "double", "isNullable": True},
                    {"name": "Status", "dataType": "string", "isNullable": False},
                    {"name": "Region", "dataType": "string", "isNullable": True},
                ],
                "measures": [
                    {
                        "name": "High Risk Shipments",
                        "expression": (
                            "CALCULATE(COUNT(Shipment[ShipmentID]), "
                            "Shipment[Temperature] > 25)"
                        ),
                        "displayFolder": "",
                        "description": "Count of high-risk shipments",
                    },
                    {
                        "name": "Shipment Risk Level",
                        "expression": (
                            'SWITCH(TRUE(), Shipment[Temperature] > 25, "High", '
                            'Shipment[Vibration] > 5, "High", '
                            'Shipment[Status] = "Delayed", "Medium", "Low")'
                        ),
                        "displayFolder": "",
                        "description": "",
                    },
                ],
            },
            {
                "name": "Returns",
                "description": "Returns fact table",
                "columns": [
                    {"name": "ReturnID", "dataType": "string", "isKey": True,
                     "isNullable": False},
                    {"name": "CustomerID", "dataType": "string", "isNullable": False},
                    {"name": "Reason", "dataType": "string", "isNullable": True},
                ],
                "measures": [
                    {
                        "name": "High Risk Customer",
                        "expression": conflict_expr,
                        "displayFolder": "",
                        "description": "Conflicting cross-repo definition",
                    }
                ],
            },
        ],
        "relationships": [
            {"name": "Orders_Customer", "fromTable": "Orders", "fromColumn": "CustomerID",
             "toTable": "Customer", "toColumn": "CustomerID",
             "fromCardinality": "many", "toCardinality": "one",
             "crossFilteringBehavior": "singleDirection", "isActive": True},
            {"name": "Orders_Product", "fromTable": "Orders", "fromColumn": "ProductID",
             "toTable": "Product", "toColumn": "ProductID",
             "fromCardinality": "many", "toCardinality": "one",
             "crossFilteringBehavior": "singleDirection", "isActive": True},
            {"name": "Orders_Calendar", "fromTable": "Orders", "fromColumn": "OrderDate",
             "toTable": "Calendar", "toColumn": "Date",
             "fromCardinality": "many", "toCardinality": "one",
             "crossFilteringBehavior": "bothDirections", "isActive": True},
            {"name": "Shipment_Customer", "fromTable": "Shipment",
             "fromColumn": "CustomerID", "toTable": "Customer", "toColumn": "CustomerID",
             "fromCardinality": "many", "toCardinality": ship_to_card,
             "crossFilteringBehavior": "singleDirection", "isActive": True},
            {"name": "Returns_Customer", "fromTable": "Returns",
             "fromColumn": "CustomerID", "toTable": "Customer", "toColumn": "CustomerID",
             "fromCardinality": "many", "toCardinality": "one",
             "crossFilteringBehavior": "singleDirection", "isActive": False},
        ],
        "roles": [
            {
                "name": "RegionalManager",
                "tablePermissions": [
                    {"name": "Shipment",
                     "filterExpression": "Shipment[Region] = USERNAME()"},
                    {"name": "Orders", "filterExpression": ""},
                ],
            }
        ],
    }
    doc = {"model": model} if repo_idx % 3 == 0 else model
    return json.dumps(doc, sort_keys=True)


def _m_script(repo_idx: int, j: int) -> str:
    host = f"sqlserver-{repo_idx % 5}.acme.com"
    db = f"SalesDW{repo_idx % 7}"
    schema, item = ("dbo", ["Sales", "Customers", "Shipments"][j % 3])
    return (
        "let\n"
        f'    Source = Sql.Database("{host}", "{db}"),\n'
        f'    {schema}_{item} = Source{{[Schema="{schema}", Item="{item}"]}}[Data]\n'
        "in\n"
        f"    {schema}_{item}"
    )


def _report_json(repo_idx: int) -> str:
    visuals = [
        {"visualType": "barChart",
         "projections": {"Y": [{"queryRef": "Orders.OrderValue"}],
                         "Category": [{"queryRef": "Product.Category"}]}},
        {"visualType": "lineChart",
         "projections": {"Y": [{"queryRef": "Shipment.Temperature"}],
                         "Category": [{"queryRef": "Calendar.Date"}]}},
        {"visualType": "card",
         "projections": {"Values": [{"queryRef": "Customer.CustomerID"}]}},
    ]
    layout = {
        "sections": [
            {
                "name": f"Page{p}",
                "visualContainers": [
                    {"config": json.dumps({"singleVisual": v}, sort_keys=True)}
                    for v in visuals[: 2 + (repo_idx + p) % 2]
                ],
            }
            for p in range(1 + repo_idx % 2)
        ]
    }
    return json.dumps(layout, sort_keys=True)


def _ontology_sidecar_json(repo_idx: int) -> str:
    """Ontology-JSON constraint sidecar (the engine's closed-schema form
    of the reference's mcp_server.py:268-296 constraint load path):
    governance constraints maintained alongside the model, exercising
    the enum/reference/message property constraints and entity-level
    constraints the name heuristics never suggest."""
    doc = {
        "dataset": f"Dashboard {repo_idx}",
        "entities": [
            {
                "name": "Customer",
                "properties": [
                    {
                        "name": "Segment",
                        "constraints": [
                            {
                                "type": "enum",
                                "values": ["Consumer", "Enterprise", "SMB"],
                                "message": "Segment must be a known tier",
                            }
                        ],
                    }
                ],
            },
            {
                "name": "Orders",
                "properties": [
                    {
                        "name": "CustomerID",
                        "constraints": [
                            {
                                "type": "reference",
                                "target": "Customer",
                                "message": "Orders.CustomerID must reference Customer",
                            }
                        ],
                    }
                ],
                "constraints": [
                    {
                        "type": "row_count",
                        "value": "row_count > 0",
                        "message": "Orders must not be empty",
                    }
                ],
            },
        ],
    }
    return json.dumps(doc, sort_keys=True)


def synth_corpus_rows(
    n_repos: int = 8,
    seed: int = 42,
    mega_repo_idx: int = 2,
    mega_factor: int = 50,
    base_extra_measures: int = 2,
) -> list[tuple[str, str, str, str, str, str]]:
    """Generate corpus rows deterministically (pure function of args)."""
    rows: list[tuple[str, str, str, str, str, str]] = []
    for i in range(n_repos):
        rng = random.Random(f"{seed}:{i}")
        repo = f"org{i % 10}/dashboards-{i}"
        commit = _commit(rng)
        n_extra = base_extra_measures * (mega_factor if i == mega_repo_idx else 1)

        def add(path: str, lang: str, content: str) -> None:
            rows.append((repo, path, commit, lang, content, _sha256(content)))

        add(f"Dashboard{i}.pbix/DataModel/model.bim", "model_json",
            _model_json(i, rng, n_extra))
        for j, (table, name, expr) in enumerate(GOLDEN_DAX):
            add(
                f"Dashboard{i}.pbix/Measures/{name}.dax",
                "dax",
                json.dumps({"table": table, "name": name, "expression": expr},
                           sort_keys=True),
            )
        for j in range(2):
            add(f"Dashboard{i}.pbix/PowerQuery/query{j}.m", "m", _m_script(i, j))
        add(f"Dashboard{i}.pbix/Report/Layout", "report_json", _report_json(i))
        add(
            f"Dashboard{i}.pbix/Ontology/constraints.json",
            "ontology_json",
            _ontology_sidecar_json(i),
        )
    return rows


def corpus_df(
    spark: SparkSession,
    n_repos: int = 8,
    seed: int = 42,
    mega_repo_idx: int = 2,
    mega_factor: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic corpus as a DataFrame (driver-side synthesis — fine for
    tests/bench; at 10^12-file scale the corpus is an existing Iceberg
    table read with :func:`read_corpus`)."""
    rows = synth_corpus_rows(n_repos, seed, mega_repo_idx, mega_factor)
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions, "repo", "path")
    return df


def write_corpus_parquet(
    path: str,
    n_repos: int = 8,
    seed: int = 42,
    mega_repo_idx: int = 2,
    mega_factor: int = 50,
    base_extra_measures: int = 2,
) -> str:
    """Materialize the synthetic corpus as ONE parquet file without
    Spark (pyarrow) so the driver's DuckDB oracle and the Spark engine
    read byte-identical input — the fixture behind the kg_* correctness
    gate.  Idempotent: returns ``path`` without rewriting if present.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rows = synth_corpus_rows(
        n_repos, seed, mega_repo_idx, mega_factor, base_extra_measures
    )
    names = [f.name for f in CORPUS_SCHEMA.fields]
    table = pa.table(
        {name: [r[i] for r in rows] for i, name in enumerate(names)}
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)
    return path


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a persisted corpus table.

    On a real cluster this is an Iceberg table partitioned by
    ``bucket(N, repo)`` with metadata-level pruning on ``lang``;
    locally it is parquet with the same layout.
    """
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def verify_content_sha(df: DataFrame) -> DataFrame:
    """Per-row invariant: sha256(content) must equal the recorded hash.

    Returns rows that FAIL the invariant (empty ⇒ corpus intact).
    JVM-side sha2 — no Python in the hot path.
    """
    return df.where(F.sha2(F.col("content"), 256) != F.col("content_sha256"))
