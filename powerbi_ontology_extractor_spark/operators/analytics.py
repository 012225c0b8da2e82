"""Cross-dashboard analytics: conflicts, duplicate logic, canonical
definitions, semantic debt.

The reference does all of this with O(n²) nested Python loops over
object lists (/root/reference/powerbi_ontology/analyzer.py:79-295,
/root/reference/powerbi_ontology/semantic_debt.py:306-530); here every
family is a hash self-join or group-by.

Dashboard identity ("source") = ``repo || '/' || dataset``.

Scale notes:
- conflict self-joins shuffle on ``lower(name)``; a hot measure name
  (thousands of dashboards defining "Total Sales") explodes pairs —
  AQE skew-join splits the partitions, and `max_group` caps pathological
  groups (pair output is inherently quadratic per group; the cap is a
  policy choice surfaced to the caller, logged via the `capped` column).
- group-by families (duplicates, canonical, debt counts) are
  partial-aggregated map-side by Catalyst.
- SequenceMatcher similarity (rule conflicts) runs in an Arrow-batched
  UDF over the *grouped* conditions — exact pairwise scoring only
  inside name blocks, never across the corpus (the LSH blocking
  variant for unbounded blocks lives in canonicalize.py).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from powerbi_ontology_extractor_spark.functions.naming import normalize_formula
from powerbi_ontology_extractor_spark.functions.salt import with_salt


def _src() -> Column:
    return F.concat_ws("/", F.col("repo"), F.col("dataset"))


def _with_src(df: DataFrame) -> DataFrame:
    # cross-dashboard analytics operate on model-extracted rows only
    # (the reference analyzes SemanticModel objects; standalone lang='dax'
    # corpus rows have no dashboard identity)
    return df.where(F.col("dataset") != "Standalone").withColumn("src", _src())


def measure_conflicts(measures: DataFrame, max_group: int = 1000) -> DataFrame:
    """Same measure name (case-insensitive), different formulas — one
    row per conflicting *pair* (analyzer.py:79-121).

    Severity heuristic (analyzer.py:319-335): equal case-insensitively →
    LOW; both have '>' and first extracted integer thresholds differ by
    >20 → HIGH; else MEDIUM.

    ``max_group`` guard: hot concepts (pair output is quadratic per
    group) are down-sampled to ~``max_group`` members with a
    deterministic hash-sample — NO window.  A row_number window would
    shuffle the entire hot group onto one task before truncating, i.e.
    the cap itself would be the skew bottleneck at cluster scale; the
    hash-sample needs only a per-concept count (map-side combinable)
    joined back.  Truncation is observable via the ``capped`` flag.
    Pair orientation uses the (src, name) tuple order directly
    (equivalent to the old rank order, minus degenerate identical
    (src, name) duplicates).
    """
    m = _with_src(measures).select(
        F.lower(F.col("measure")).alias("concept"),
        F.col("measure").alias("name"),
        "src",
        F.col("dax_formula").alias("formula"),
    )
    # per-concept counts: tiny per key after map-side combine; plain
    # shuffle join back (concept cardinality can be huge — never
    # broadcast; AQE splits the skewed probe side)
    counts = m.groupBy("concept").agg(F.count("*").alias("_n"))
    m = m.join(counts, "concept").withColumn(
        "capped", F.col("_n") > max_group
    )
    keep_prob = F.least(
        F.lit(1.0), F.lit(float(max_group)) / F.col("_n")
    )
    sampled = m.where(
        ~F.col("capped")
        | (
            F.pmod(F.xxhash64("src", "name"), F.lit(1_000_000))
            < (keep_prob * 1_000_000).cast("long")
        )
    )
    a, b = sampled.alias("a"), sampled.alias("b")
    pairs = a.join(
        b,
        (F.col("a.concept") == F.col("b.concept"))
        & (
            (F.col("a.src") < F.col("b.src"))
            | (
                (F.col("a.src") == F.col("b.src"))
                & (F.col("a.name") < F.col("b.name"))
            )
        ),
    ).where(F.col("a.formula") != F.col("b.formula"))

    f1, f2 = F.col("a.formula"), F.col("b.formula")
    th1 = F.regexp_extract(f1, r"[><=]+\s*(\d+)", 1)
    th2 = F.regexp_extract(f2, r"[><=]+\s*(\d+)", 1)
    severity = (
        F.when(F.lower(f1) == F.lower(f2), "LOW")
        .when(
            f1.contains(">")
            & f2.contains(">")
            & (th1 != "")
            & (th2 != "")
            & (F.abs(th1.cast("long") - th2.cast("long")) > 20),
            "HIGH",
        )
        .otherwise("MEDIUM")
    )
    return pairs.select(
        F.col("a.concept").alias("concept"),
        F.col("a.src").alias("dashboard1"),
        f1.alias("definition1"),
        F.col("b.src").alias("dashboard2"),
        f2.alias("definition2"),
        severity.alias("severity"),
        F.concat(
            F.lit("'"),
            F.col("a.concept"),
            F.lit("' defined differently in "),
            F.col("a.src"),
            F.lit(" vs "),
            F.col("b.src"),
        ).alias("description"),
    )


def entity_structure_conflicts(
    properties: DataFrame, max_group: int = 10_000
) -> DataFrame:
    """Same entity name (ci), different {property→type} maps — pairwise
    (analyzer.py:123-150).  The map compare is a sorted-struct-array
    equality (order-insensitive, as the reference's dict compare).

    Same fingerprint-group shape as entity_conflicts_debt: the join
    pairs distinct (concept, props) structure groups, never raw src
    rows, so a hot entity name with one dominant structure emits zero
    pairs instead of a quadratic self-join.  Src exemplars per group
    are salted two-phase collected and capped at ``max_group``."""
    e = (
        _with_src(properties)
        .groupBy(F.lower(F.col("entity")).alias("concept"), "src")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("property", "data_type"))
            ).alias("props"),
        )
    )
    partial = (
        with_salt(e, ["src"], 16)
        .groupBy("concept", "props", "_salt")
        .agg(F.slice(F.array_sort(F.collect_list("src")), 1, max_group).alias("_srcs"))
    )
    groups = partial.groupBy("concept", "props").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_srcs"))), 1, max_group
        ).alias("srcs")
    )
    a, b = groups.alias("a"), groups.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.concept") == F.col("b.concept"))
            & (F.col("a.props") < F.col("b.props")),
        )
        .select(
            F.col("a.concept").alias("concept"),
            F.size(F.col("a.props")).alias("n_a"),
            F.size(F.col("b.props")).alias("n_b"),
            F.explode(F.col("a.srcs")).alias("src_a"),
            F.col("b.srcs").alias("srcs_b"),
        )
        .select(
            "concept", "n_a", "n_b", "src_a",
            F.explode(F.col("srcs_b")).alias("src_b"),
        )
    )
    swap = F.col("src_a") > F.col("src_b")
    n1 = F.when(swap, F.col("n_b")).otherwise(F.col("n_a"))
    n2 = F.when(swap, F.col("n_a")).otherwise(F.col("n_b"))
    return pairs.select(
        "concept",
        F.least("src_a", "src_b").alias("dashboard1"),
        F.concat(n1.cast("string"), F.lit(" properties")).alias("definition1"),
        F.greatest("src_a", "src_b").alias("dashboard2"),
        F.concat(n2.cast("string"), F.lit(" properties")).alias("definition2"),
        F.lit("MEDIUM").alias("severity"),
        F.concat(
            F.lit("Entity '"),
            F.col("concept"),
            F.lit("' has different properties across dashboards"),
        ).alias("description"),
    )


def duplicate_logic(
    measures: DataFrame, buckets: int = 16, max_exemplars: int = 10_000
) -> DataFrame:
    """Group by normalized formula; >1 occurrence ⇒ duplication
    (analyzer.py:154-200).

    Hot-key shape: a formula shared by 10⁶ dashboards would funnel one
    reducer and build a 10⁶-element array — so the collect is salted
    two-phase (partial lists per (norm, salt), flatten-merge), the
    merged exemplar arrays are capped at ``max_exemplars`` (sorted →
    deterministic), and the exact group size is carried separately as
    ``n_dashboards`` so counts never depend on the cap.
    """
    m = _with_src(measures).select(
        "src",
        F.col("measure").alias("name"),
        F.col("dax_formula").alias("formula"),
        normalize_formula(F.col("dax_formula")).alias("norm"),
    )
    partial = (
        with_salt(m, ["src", "name"], buckets)
        .groupBy("norm", "_salt")
        .agg(
            F.collect_list("src").alias("_srcs"),
            F.collect_list("name").alias("_names"),
            F.min("formula").alias("_formula"),
            F.count("*").alias("_n"),
        )
    )
    g = (
        partial.groupBy("norm")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_srcs"))),
                1,
                max_exemplars,
            ).alias("dashboards"),
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_names"))),
                1,
                max_exemplars,
            ).alias("names"),
            F.min("_formula").alias("dax_formula"),
            F.sum("_n").cast("bigint").alias("n_dashboards"),
        )
        .where(F.col("n_dashboards") > 1)
    )
    same_name = F.size(F.array_distinct(F.col("names"))) == 1
    return g.select(
        F.when(same_name, F.element_at("names", 1))
        .otherwise(
            F.concat(
                F.element_at("names", 1),
                F.lit(" (and "),
                (F.col("n_dashboards") - 1).cast("string"),
                F.lit(" others)"),
            )
        )
        .alias("measure_name"),
        "dashboards",
        "dax_formula",
        "n_dashboards",
        F.when(
            same_name,
            F.concat(
                F.lit("Same measure '"),
                F.element_at("names", 1),
                F.lit("' duplicated across "),
                F.col("n_dashboards").cast("string"),
                F.lit(" dashboards"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("Same logic with different names: "),
                F.array_join("names", ", "),
            )
        )
        .alias("description"),
    )


def canonical_definitions(measures: DataFrame) -> DataFrame:
    """Per multiply-defined measure name: the *mode* of the normalized
    formula is the suggested canonical; confidence = mode_count / total
    (analyzer.py:240-295).  mode-per-group = count → row_number window.
    """
    m = _with_src(measures).select(
        F.lower(F.col("measure")).alias("name"),
        "src",
        F.col("dax_formula").alias("formula"),
        normalize_formula(F.col("dax_formula")).alias("norm"),
    )
    # salted two-phase collect: a KPI name used by 10⁶ dashboards must
    # not funnel one reducer; exemplar srcs capped, exact cnt carried
    partial = (
        with_salt(m, ["src"], 16)
        .groupBy("name", "norm", "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.collect_list("src").alias("_srcs"),
        )
    )
    counts = partial.groupBy("name", "norm").agg(
        F.sum("_n").alias("cnt"),
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_srcs"))), 1, 10_000
        ).alias("srcs"),
    )
    # totals derived from the aggregated frame — no second scan of m
    totals = (
        counts.groupBy("name")
        .agg(F.sum("cnt").alias("total"))
        .where(F.col("total") > 1)
    )
    # the window runs over (name, norm) AGGREGATES (distinct formulas
    # per name), not raw rows — cardinality-bounded, not a skew risk
    w = Window.partitionBy("name").orderBy(F.desc("cnt"), "norm")
    ranked = counts.join(totals, "name").withColumn(
        "rk", F.row_number().over(w)
    )
    winners = ranked.where(F.col("rk") == 1).select(
        "name",
        F.col("norm").alias("suggested_definition"),
        F.col("srcs").alias("dashboards_using"),
        (F.col("cnt") / F.col("total")).alias("confidence"),
    )
    alternatives = (
        ranked.where(F.col("rk") > 1)
        .groupBy("name")
        .agg(F.flatten(F.collect_list("srcs")).alias("alternative_sources"))
    )
    return winners.join(alternatives, "name", "left").withColumn(
        "alternative_sources",
        F.coalesce(F.col("alternative_sources"), F.array()),
    )


def semantic_debt(conflicts: DataFrame, duplications: DataFrame) -> DataFrame:
    """$50K × conflicts + $10K × duplications, counts by severity
    (analyzer.py:202-238) — one scalar row."""
    by_sev = (
        conflicts.groupBy("severity")
        .count()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("severity", "count"))
            ).alias("conflicts_by_severity")
        )
    )
    n_conf = conflicts.select(F.count("*").alias("total_conflicts"))
    n_dup = duplications.select(F.count("*").alias("total_duplications"))
    return (
        n_conf.crossJoin(n_dup)
        .crossJoin(by_sev)
        .select(
            "total_conflicts",
            "total_duplications",
            F.lit(50000.0).alias("cost_per_conflict"),
            (
                F.col("total_conflicts") * 50000.0
                + F.col("total_duplications") * 10000.0
            ).alias("total_cost"),
            "conflicts_by_severity",
        )
    )


# --- semantic_debt.py-family conflicts (ontology-level) ----------------------


def entity_conflicts_debt(
    properties: DataFrame, max_group: int = 10_000
) -> DataFrame:
    """Same entity name (exact), different property *sets*; severity by
    overlap ratio |∩|/|∪| (<0.5 CRITICAL, <0.8 WARNING, else INFO)
    (semantic_debt.py:334-386,506-526).  Jaccard via array_intersect /
    array_union on pre-aggregated name sets.

    Skew shape: conflicts only exist between *distinct* property sets,
    so the join pairs (name, props) FINGERPRINT GROUPS, not raw (name,
    src) rows.  An entity named "Date" defined identically in 10⁵
    dashboards — the expected hot key at corpus scale — collapses to
    ONE group and emits zero pairs instead of 10¹⁰ joined-then-filtered
    rows; distinct definitions per name are few.  Src exemplars per
    group are collected salted two-phase and capped at ``max_group``
    (sorted → deterministic; pair output is inherently |g1|×|g2| per
    group pair — the cap is the same surfaced policy as
    measure_conflicts').  Equivalent to the old (src < src) self-join:
    cross-group src pairs are re-oriented so src1 < src2, and
    same-group pairs are exactly the ones the old only_in filter
    dropped."""
    e = (
        _with_src(properties)
        .groupBy(F.col("entity").alias("name"), "src")
        .agg(F.array_sort(F.collect_set("property")).alias("props"))
    )
    partial = (
        with_salt(e, ["src"], 16)
        .groupBy("name", "props", "_salt")
        .agg(F.slice(F.array_sort(F.collect_list("src")), 1, max_group).alias("_srcs"))
    )
    groups = partial.groupBy("name", "props").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_srcs"))), 1, max_group
        ).alias("srcs")
    )
    a, b = groups.alias("a"), groups.alias("b")
    pairs = a.join(
        b,
        (F.col("a.name") == F.col("b.name"))
        & (F.col("a.props") < F.col("b.props")),
    ).select(
        F.col("a.name").alias("name"),
        F.col("a.props").alias("props_a"),
        F.col("b.props").alias("props_b"),
        F.explode(F.col("a.srcs")).alias("src_a"),
        F.col("b.srcs").alias("srcs_b"),
    ).select(
        "name", "props_a", "props_b", "src_a",
        F.explode(F.col("srcs_b")).alias("src_b"),
    )
    # re-orient each src pair so src1 < src2 (the old join's order);
    # the only_in legs swap with it
    swap = F.col("src_a") > F.col("src_b")
    p1 = F.when(swap, F.col("props_b")).otherwise(F.col("props_a"))
    p2 = F.when(swap, F.col("props_a")).otherwise(F.col("props_b"))
    only1 = F.array_sort(F.array_except(p1, p2))
    only2 = F.array_sort(F.array_except(p2, p1))
    common = F.size(F.array_intersect(p1, p2))
    total = F.size(F.array_union(p1, p2))
    ratio = common / total
    severity = (
        F.when(total == 0, "INFO")
        .when(ratio < 0.5, "CRITICAL")
        .when(ratio < 0.8, "WARNING")
        .otherwise("INFO")
    )
    return (
        pairs.where((F.size(only1) > 0) | (F.size(only2) > 0))
        .select(
            F.lit("entity_conflict").alias("conflict_type"),
            severity.alias("severity"),
            "name",
            F.array(
                F.least("src_a", "src_b"), F.greatest("src_a", "src_b")
            ).alias("sources"),
            only1.alias("only_in_1"),
            only2.alias("only_in_2"),
            ratio.alias("overlap_ratio"),
        )
    )


def property_type_conflicts(properties: DataFrame) -> DataFrame:
    """Same (entity, property), >1 distinct type — always CRITICAL
    (semantic_debt.py:388-422)."""
    return (
        _with_src(properties)
        .groupBy("entity", "property")
        .agg(
            F.count_distinct("data_type").alias("n_types"),
            F.array_sort(F.collect_set("data_type")).alias("types"),
            F.array_sort(F.collect_set("src")).alias("sources"),
        )
        .where(F.col("n_types") > 1)
        .select(
            F.lit("type_conflict").alias("conflict_type"),
            F.lit("CRITICAL").alias("severity"),
            F.concat_ws(".", "entity", "property").alias("name"),
            "sources",
            "types",
        )
    )


def relationship_conflicts(relationships: DataFrame) -> DataFrame:
    """Same (from, to) endpoints, >1 distinct cardinality — WARNING
    (semantic_debt.py:424-460)."""
    return (
        _with_src(relationships)
        .groupBy("from_entity", "to_entity")
        .agg(
            F.count_distinct("cardinality").alias("n_cards"),
            F.array_sort(F.collect_set("cardinality")).alias("cardinalities"),
            F.array_sort(F.collect_set("src")).alias("sources"),
        )
        .where(F.col("n_cards") > 1)
        .select(
            F.lit("relationship_conflict").alias("conflict_type"),
            F.lit("WARNING").alias("severity"),
            F.concat_ws(" → ", "from_entity", "to_entity").alias("name"),
            "sources",
            "cardinalities",
        )
    )


@F.pandas_udf(DoubleType())
def _seq_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    """difflib SequenceMatcher ratio, Arrow-batched
    (semantic_debt.py:528-530)."""
    return pd.Series(
        [
            SequenceMatcher(None, (x or "").lower(), (y or "").lower()).ratio()
            for x, y in zip(a, b)
        ]
    )


def rule_conflicts(
    business_rules: DataFrame, similarity_threshold: float = 0.8
) -> DataFrame:
    """Same rule name, >1 distinct condition; severity by
    SequenceMatcher similarity of the first two distinct conditions
    (semantic_debt.py:462-504).  Exact similarity only runs *inside*
    name groups — the group-by is the blocking step.

    The collect_sets are salted two-phase (hot rule names spread over
    16 reducers, distinct-merge after) and capped at 10k exemplars
    post-sort — the severity probe only reads the first two sorted
    conditions, which the cap never disturbs."""
    r = _with_src(business_rules)
    partial = (
        with_salt(r, ["src", "condition"], 16)
        .groupBy("name", "_salt")
        .agg(
            F.collect_set("condition").alias("_conds"),
            F.collect_set("src").alias("_srcs"),
        )
    )
    g = (
        partial.groupBy("name")
        .agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("_conds")))
                ),
                1,
                10_000,
            ).alias("conditions"),
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("_srcs")))
                ),
                1,
                10_000,
            ).alias("sources"),
        )
        .where(F.size("conditions") > 1)
    )
    sim = _seq_similarity(
        F.element_at("conditions", 1), F.element_at("conditions", 2)
    )
    return g.withColumn("similarity", sim).select(
        F.lit("rule_conflict").alias("conflict_type"),
        F.when(F.col("similarity") < similarity_threshold, "CRITICAL")
        .otherwise("WARNING")
        .alias("severity"),
        "name",
        "sources",
        "conditions",
        "similarity",
    )


def analyze_debt(
    properties: DataFrame,
    relationships: DataFrame,
    business_rules: DataFrame,
    similarity_threshold: float = 0.8,
) -> DataFrame:
    """Union of the four ontology-level conflict families
    (semantic_debt.py:306-332), normalized to a common schema."""
    common = ["conflict_type", "severity", "name", "sources"]
    return (
        entity_conflicts_debt(properties)
        .select(*common)
        .unionByName(property_type_conflicts(properties).select(*common))
        .unionByName(relationship_conflicts(relationships).select(*common))
        .unionByName(
            rule_conflicts(business_rules, similarity_threshold).select(*common)
        )
    )
