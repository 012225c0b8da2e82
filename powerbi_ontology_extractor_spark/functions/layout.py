"""Report-layout parsing → report→uses→dataset, visual→binds→field edges.

The reference reads ``Report/Layout`` (UTF-16 JSON) but never consumes
it (/root/reference/powerbi_ontology/utils/pbix_reader.py:534-565 —
latent surface); the north star requires the report/visual edge
families.

Layout shape (observed Power BI layout schema)::

    {"sections": [{"name": "...", "visualContainers": [
        {"config": "<json string with singleVisual.visualType and
                     projections.<role>[].queryRef>"}]}]}

Two-level ``from_json`` (the config cell is a JSON *string* inside the
outer JSON) — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from powerbi_ontology_extractor_spark.functions.naming import safe_name
from powerbi_ontology_extractor_spark.operators.triples import _rows, _uri

LAYOUT_SCHEMA = StructType(
    [
        StructField(
            "sections",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField(
                            "visualContainers",
                            ArrayType(
                                StructType([StructField("config", StringType())])
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

CONFIG_SCHEMA = StructType(
    [
        StructField(
            "singleVisual",
            StructType(
                [
                    StructField("visualType", StringType()),
                    StructField(
                        "projections",
                        MapType(
                            StringType(),
                            ArrayType(
                                StructType(
                                    [StructField("queryRef", StringType())]
                                )
                            ),
                        ),
                    ),
                ]
            ),
        )
    ]
)


def visual_bindings_df(corpus: DataFrame) -> DataFrame:
    """(repo, path, page, visual_idx, visual_type, role, query_ref) —
    one row per field binding."""
    r = corpus.where(F.col("lang") == "report_json").select(
        "repo",
        "path",
        F.from_json(F.col("content"), LAYOUT_SCHEMA).alias("layout"),
    )
    sections = r.select(
        "repo", "path", F.explode("layout.sections").alias("s")
    ).select(
        "repo",
        "path",
        F.col("s.name").alias("page"),
        F.posexplode(F.coalesce(F.col("s.visualContainers"), F.array())).alias(
            "visual_idx", "vc"
        ),
    )
    visuals = sections.select(
        "repo",
        "path",
        "page",
        "visual_idx",
        F.from_json(F.col("vc.config"), CONFIG_SCHEMA)["singleVisual"].alias("v"),
    )
    return visuals.select(
        "repo",
        "path",
        "page",
        "visual_idx",
        F.col("v.visualType").alias("visual_type"),
        F.explode_outer(
            F.coalesce(F.col("v.projections"), F.create_map())
        ).alias("role", "refs"),
    ).select(
        "repo",
        "path",
        "page",
        "visual_idx",
        "visual_type",
        "role",
        F.explode_outer("refs").alias("ref"),
    ).select(
        "repo",
        "path",
        "page",
        "visual_idx",
        "visual_type",
        "role",
        F.col("ref.queryRef").alias("query_ref"),
    )


def report_triples(corpus: DataFrame, models: DataFrame) -> DataFrame:
    """report→uses→dataset + visual→binds→field triples.

    ``queryRef`` 'Table.Column' resolves to the property IRI
    ``ont:<Table>_<Column>`` (same scheme as property emission)."""
    b = visual_bindings_df(corpus)
    datasets = models.select("repo", "dataset").dropDuplicates()
    df = b.join(F.broadcast(datasets), "repo", "left").withColumn(
        "dataset", F.coalesce(F.col("dataset"), F.lit("Unknown"))
    )
    report = _uri("ont:report_", safe_name(F.col("path")))
    visual = _uri(
        "ont:visual_",
        safe_name(F.col("path")),
        "_",
        safe_name(F.col("page")),
        "_",
        F.col("visual_idx").cast("string"),
    )
    field = _uri("ont:", safe_name(F.col("query_ref")))
    report_rows = _rows(
        df.dropDuplicates(["repo", "path"]),
        [
            (report, "rdf:type", F.lit("ont:Report"), False, ""),
            (
                report,
                "ont:usesDataset",
                _uri("ont:", safe_name(F.col("dataset"))),
                False,
                "",
            ),
        ],
    )
    visual_rows = _rows(
        df.dropDuplicates(["repo", "path", "page", "visual_idx"]),
        [
            (visual, "rdf:type", F.lit("ont:Visual"), False, ""),
            (visual, "ont:visualType", F.col("visual_type"), True, ""),
            (visual, "ont:onPage", F.col("page"), True, ""),
            (visual, "ont:inReport", report, False, ""),
        ],
    )
    binding_rows = _rows(
        df.where(F.col("query_ref").isNotNull()),
        [(visual, "ont:bindsField", field, False, "")],
    )
    return report_rows.unionByName(visual_rows).unionByName(binding_rows)
