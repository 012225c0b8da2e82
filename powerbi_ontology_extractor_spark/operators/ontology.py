"""Ontology generation: model DataFrames → ontology DataFrames.

Reference semantics: /root/reference/powerbi_ontology/ontology_generator.py
- entity typing via pattern detection (:258-312) applied in order
  date_table → dimension → fact, each overwriting (:400-406), over a
  base classification (:368-374);
- relationship-type heuristics (:376-398);
- measures → business rules through the DAX parser (:166-171,236-256).

Spark shape: the degree count (G6) and measure count (G7) are the only
shuffles — small hash aggregations on (repo, dataset, entity) — joined
back broadcast-style onto entities.  Everything else is projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.functions.dax import parse_measures


def _degree_df(relationships: DataFrame) -> DataFrame:
    """Per-entity relationship degree.  A relationship contributes 1 to
    each *distinct* endpoint (a self-loop counts once —
    ontology_generator.py:287-290 counts rows with an OR predicate)."""
    return (
        relationships.select(
            "repo",
            "dataset",
            F.explode(
                F.array_distinct(
                    F.array(F.col("from_entity"), F.col("to_entity"))
                )
            ).alias("entity"),
        )
        .groupBy("repo", "dataset", "entity")
        .agg(F.count("*").alias("degree"))
    )


def _measure_count_df(measures: DataFrame) -> DataFrame:
    return (
        measures.where(F.col("dataset") != "Standalone")
        .groupBy("repo", "dataset", F.col("table").alias("entity"))
        .agg(F.count("*").alias("measure_count"))
    )


def _has_date_columns(properties: DataFrame) -> DataFrame:
    """Entities having any property whose name contains a date keyword
    (ontology_generator.py:271-278)."""
    date_kw = F.lit(False)
    p = F.lower(F.col("property"))
    for kw in ["year", "month", "day", "quarter", "week"]:
        date_kw = date_kw | p.contains(kw)
    return (
        properties.groupBy("repo", "dataset", "entity")
        .agg(F.max(date_kw).alias("has_date_columns"))
    )


def _name_is_datey(entity: Column) -> Column:
    lc = F.lower(entity)
    return lc.contains("date") | lc.contains("calendar") | lc.contains("time")


def detect_patterns(
    entities: DataFrame,
    properties: DataFrame,
    relationships: DataFrame,
    measures: DataFrame,
) -> DataFrame:
    """One row per (entity, pattern_type) with confidence — the
    reference's Pattern list (:258-312).  Broadcast-friendly: all
    aggregates are per-dataset-tiny."""
    enriched = (
        entities.join(_degree_df(relationships), ["repo", "dataset", "entity"], "left")
        .join(_measure_count_df(measures), ["repo", "dataset", "entity"], "left")
        .join(_has_date_columns(properties), ["repo", "dataset", "entity"], "left")
        .fillna({"degree": 0, "measure_count": 0, "has_date_columns": False})
    )
    date_p = enriched.where(
        _name_is_datey(F.col("entity")) & F.col("has_date_columns")
    ).select(
        "repo",
        "dataset",
        "entity",
        F.lit("date_table").alias("pattern_type"),
        F.lit(0.9).alias("confidence"),
    )
    dim_p = enriched.where(
        (F.col("degree") >= 3) & (F.col("n_properties") < 20)
    ).select(
        "repo",
        "dataset",
        "entity",
        F.lit("dimension").alias("pattern_type"),
        F.lit(0.7).alias("confidence"),
    )
    fact_p = enriched.where(
        (F.col("measure_count") > 0) & (F.col("degree") <= 3)
    ).select(
        "repo",
        "dataset",
        "entity",
        F.lit("fact").alias("pattern_type"),
        F.lit(0.8).alias("confidence"),
    )
    return date_p.unionByName(dim_p).unionByName(fact_p)


def ontology_entities_df(
    entities: DataFrame,
    properties: DataFrame,
    relationships: DataFrame,
    measures: DataFrame,
    patterns: DataFrame | None = None,
) -> DataFrame:
    """Entities + final entity_type.

    The reference appends patterns in order date_table, dimension, fact
    per entity and then overwrites entity_type sequentially
    (:400-406) — so when several fire, the LAST wins:
    fact > dimension > date_table; with none, the base classification
    ('date' if the name is datey, else 'standard', :368-374).
    """
    if patterns is None:
        patterns = detect_patterns(entities, properties, relationships, measures)
    pivoted = (
        patterns
        .groupBy("repo", "dataset", "entity")
        .agg(F.collect_set("pattern_type").alias("patterns"))
    )
    joined = entities.join(pivoted, ["repo", "dataset", "entity"], "left")
    has = lambda p: F.array_contains(F.coalesce(F.col("patterns"), F.array()), p)
    entity_type = (
        F.when(has("fact"), "fact")
        .when(has("dimension"), "dimension")
        .when(has("date_table"), "date_table")
        .when(_name_is_datey(F.col("entity")), "date")
        .otherwise("standard")
    )
    return joined.select(
        "repo",
        "dataset",
        "entity",
        "description",
        "source_table",
        "primary_key",
        "n_properties",
        entity_type.alias("entity_type"),
    )


def ontology_entities_from_models(models: DataFrame) -> DataFrame:
    """Shuffle-free entity typing: every signal the pattern detectors
    need (relationship degree, measure count, date-like columns) lives
    INSIDE the model row's own arrays, so the whole computation is one
    narrow map over the parsed models — no groupBys, no joins.

    Exact reference semantics, including two duplicate-table-name
    quirks the fuzz-parity suite caught (ontology_generator.py):
    - the fact detector's measure_count is NAME-GLOBAL (`measure.table
      == entity.name` over the whole model's measure list, :299-303);
    - `_apply_patterns` (:400-406) finds the FIRST entity with the
      pattern's name, so for duplicate names the first instance ends at
      the LAST-fired pattern across ALL instances (patterns append
      date_table→dimension→fact per instance, in table order) and the
      later instances keep the base classification (:368-374).
    The join-based :func:`ontology_entities_df` keeps the simpler
    precedence semantics for callers with only flat frames (identical
    whenever table names are unique within a model).
    """
    tables_arr = F.coalesce(F.col("model.tables"), F.array())
    t = models.select(
        "repo",
        "dataset",
        F.coalesce(F.col("model.relationships"), F.array()).alias("rels"),
        tables_arr.alias("tables"),
        F.posexplode(tables_arr).alias("pos", "t"),
    )
    name = F.coalesce(F.col("t.name"), F.lit("Unknown"))
    cols = F.coalesce(F.col("t.columns"), F.array())

    def tname(x):
        return F.coalesce(x["name"], F.lit("Unknown"))

    # reference counts relationship ROWS matching (from==e OR to==e),
    # so a self-loop contributes once (ontology_generator.py:287-290)
    degree = F.size(
        F.filter(
            F.col("rels"),
            lambda r: (F.coalesce(r["fromTable"], F.lit("")) == name)
            | (F.coalesce(r["toTable"], F.lit("")) == name),
        )
    )
    date_kw = lambda c: (
        F.lower(F.coalesce(c["name"], F.lit(""))).contains("year")
        | F.lower(F.coalesce(c["name"], F.lit(""))).contains("month")
        | F.lower(F.coalesce(c["name"], F.lit(""))).contains("day")
        | F.lower(F.coalesce(c["name"], F.lit(""))).contains("quarter")
        | F.lower(F.coalesce(c["name"], F.lit(""))).contains("week")
    )
    n_props = F.size(cols)
    # indices of every instance sharing this row's name, in table order
    same_idx = F.filter(
        F.sequence(F.lit(0), F.size(F.col("tables")) - 1),
        lambda i: tname(F.try_element_at(F.col("tables"), i + 1)) == name,
    )
    first_pos = F.try_element_at(same_idx, F.lit(1))
    # name-global measure count (sums across duplicate instances)
    global_mc = F.aggregate(
        same_idx,
        F.lit(0),
        lambda acc, i: acc
        + F.size(
            F.coalesce(
                F.try_element_at(F.col("tables"), i + 1)["measures"], F.array()
            )
        ),
    )

    def fired(i):
        """Per-instance LAST-fired pattern (append order date_table →
        dimension → fact, so fact wins within an instance)."""
        inst = F.try_element_at(F.col("tables"), i + 1)
        icols = F.coalesce(inst["columns"], F.array())
        return (
            F.when((global_mc > 0) & (degree <= 3), "fact")
            .when((degree >= 3) & (F.size(icols) < 20), "dimension")
            .when(
                _name_is_datey(name) & F.exists(icols, date_kw), "date_table"
            )
        )

    fired_list = F.filter(
        F.transform(same_idx, fired), lambda x: x.isNotNull()
    )
    chosen = F.try_element_at(fired_list, F.lit(-1))  # last-fired overall
    base = F.when(_name_is_datey(name), "date").otherwise("standard")
    entity_type = F.when(
        F.col("pos") == first_pos, F.coalesce(chosen, base)
    ).otherwise(base)
    key_cols = F.filter(
        cols,
        lambda c: F.coalesce(c["isKey"], F.lit(False))
        | F.coalesce(c["isUnique"], F.lit(False)),
    )
    return t.select(
        "repo",
        "dataset",
        name.alias("entity"),
        F.coalesce(F.col("t.description"), F.lit("")).alias("description"),
        name.alias("source_table"),
        F.try_element_at(key_cols, F.lit(1))["name"].alias("primary_key"),
        n_props.alias("n_properties"),
        entity_type.alias("entity_type"),
    )


def ontology_relationships_df(relationships: DataFrame) -> DataFrame:
    """Relationships + semantic relationship_type (:376-398)."""
    fl, tl = F.lower(F.col("from_entity")), F.lower(F.col("to_entity"))
    rel_type = (
        F.when(fl.contains("customer") & tl.contains("order"), "has")
        .when(fl.contains("order") & tl.contains("customer"), "belongs_to")
        .when(fl.contains("product") & tl.contains("order"), "contained_in")
        .when(fl.contains("shipment") & tl.contains("customer"), "belongs_to")
        .when(F.col("cardinality") == "one-to-many", "has")
        .when(F.col("cardinality") == "many-to-one", "belongs_to")
        .otherwise("related_to")
    )
    return relationships.select(
        "repo",
        "dataset",
        "from_entity",
        "from_property",
        "to_entity",
        "to_property",
        rel_type.alias("relationship_type"),
        "cardinality",
        F.concat(
            F.lit("Relationship from "),
            F.col("from_entity"),
            F.lit(" to "),
            F.col("to_entity"),
        ).alias("description"),
        F.col("name").alias("source_relationship"),
    )


def business_rules_df(parsed_measures: DataFrame) -> DataFrame:
    """Explode parsed rules into BusinessRule rows (:236-256):
    entity = rule.entity or measure.table;
    description = rule.description or measure.description."""
    r = parsed_measures.where(F.col("dataset") != "Standalone").select(
        "repo",
        "dataset",
        "table",
        F.col("measure").alias("source_measure"),
        F.col("description").alias("measure_description"),
        F.explode("rules").alias("rule"),
    )
    nz = lambda c: F.nullif(c, F.lit(""))
    return r.select(
        "repo",
        "dataset",
        F.col("rule.name").alias("name"),
        F.coalesce(nz(F.col("rule.entity")), F.col("table")).alias("entity"),
        F.col("rule.condition").alias("condition"),
        F.col("rule.action").alias("action"),
        F.col("rule.classification").alias("classification"),
        F.coalesce(
            nz(F.col("rule.description")), F.col("measure_description")
        ).alias("description"),
        F.col("rule.priority").alias("priority"),
        "source_measure",
    )


def suggest_enhancements(properties: DataFrame) -> DataFrame:
    """Constraint suggestions from property-name heuristics (:314-366).
    Tagged-struct suggested_value (Spark needs a closed type for the
    reference's untyped dict)."""
    p = F.lower(F.col("property"))
    is_numeric = F.col("data_type").isin("Integer", "Decimal")
    sugg = F.array_compact(
        F.array(
            F.when(
                p.contains("email") & (F.col("data_type") == "String"),
                F.struct(
                    F.lit("regex").alias("ctype"),
                    F.lit(r"^[^\s@]+@[^\s@]+\.[^\s@]+$").alias("pattern"),
                    F.lit(None).cast("double").alias("min"),
                    F.lit(None).cast("double").alias("max"),
                ),
            ),
            F.when(
                p.contains("url") | p.contains("website"),
                F.struct(
                    F.lit("regex").alias("ctype"),
                    F.lit(r"^https?://").alias("pattern"),
                    F.lit(None).cast("double").alias("min"),
                    F.lit(None).cast("double").alias("max"),
                ),
            ),
            F.when(
                is_numeric & p.contains("age"),
                F.struct(
                    F.lit("range").alias("ctype"),
                    F.lit(None).cast("string").alias("pattern"),
                    F.lit(0.0).alias("min"),
                    F.lit(150.0).alias("max"),
                ),
            ),
            F.when(
                is_numeric
                & ~p.contains("age")
                & (p.contains("score") | p.contains("rating")),
                F.struct(
                    F.lit("range").alias("ctype"),
                    F.lit(None).cast("string").alias("pattern"),
                    F.lit(0.0).alias("min"),
                    F.lit(100.0).alias("max"),
                ),
            ),
        )
    )
    return (
        properties.withColumn("suggestion", F.explode(sugg))
        .select(
            "repo",
            "dataset",
            "entity",
            "property",
            F.lit("validation_constraint").alias("type"),
            F.col("suggestion.ctype").alias("constraint_type"),
            F.col("suggestion.pattern").alias("pattern"),
            F.col("suggestion.min").alias("min_value"),
            F.col("suggestion.max").alias("max_value"),
        )
    )


def generate_ontology(
    model_dfs: dict[str, DataFrame], materialize: bool = False
) -> dict[str, DataFrame]:
    """Full ontology stage over the extraction outputs.

    ``materialize=True`` localCheckpoints the outputs that the triple
    fan-out consumes more than once (stage-boundary pattern; at cluster
    scale this is an Iceberg write, see plans/manifest).
    """
    # localCheckpoint, NOT persist: building the columnar cache over the
    # UDF-produced array<struct> column is pathologically slow (~20×);
    # the checkpoint materializes once and cuts the lineage
    parsed = parse_measures(model_dfs["measures"])
    patterns = detect_patterns(
        model_dfs["entities"],
        model_dfs["properties"],
        model_dfs["relationships"],
        model_dfs["measures"],
    )
    if "models" in model_dfs:
        # shuffle-free narrow path (same semantics, zero exchanges)
        onto_entities = ontology_entities_from_models(model_dfs["models"])
    else:
        onto_entities = ontology_entities_df(
            model_dfs["entities"],
            model_dfs["properties"],
            model_dfs["relationships"],
            model_dfs["measures"],
            patterns=patterns,
        )
    if materialize:
        # one concurrent barrier round: the UDF-produced parsed_measures
        # (3 downstream consumers) and the flat entity frame (entity +
        # CRUD emission both scan it — flat rows beat re-reading the
        # nested models struct twice)
        from powerbi_ontology_extractor_spark.operators.extract import (
            checkpoint_parallel,
        )

        parsed, onto_entities = checkpoint_parallel([parsed, onto_entities])
    else:
        parsed = parsed.localCheckpoint(eager=True)
    return {
        "parsed_measures": parsed,
        "ontology_entities": onto_entities,
        "ontology_relationships": ontology_relationships_df(
            model_dfs["relationships"]
        ),
        "business_rules": business_rules_df(parsed),
        "enhancements": suggest_enhancements(model_dfs["properties"]),
        "patterns": patterns,
    }
