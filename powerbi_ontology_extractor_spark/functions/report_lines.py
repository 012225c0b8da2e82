"""Distributed line-renderers for the report surfaces.

`reports.changelog_markdown` and `reports.mermaid_diagram` render
collected rows on the driver — right for KB-sized reports, wrong when a
corpus-wide changelog (every repo pair) or a graph diagram feed must be
produced at scale.  These twins render the SAME line grammar as
DataFrame expressions (pure codegen concat/when — no Python in the
plan), so lines can be written as a distributed text sink; the driver
functions remain the literal-parity surface (reference:
ontology_diff.py:113-167, utils/visualizer.py:70-120).

Null handling: the frame renderers coalesce old/new/details to ''
before formatting (the driver twins receive ''-coalesced dicts from the
entry queries, so rendered lines are byte-identical —
tests/test_reports.py pins it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: characters the mermaid node-id sanitizer rewrites to '_' AFTER the
#: 'ont:' prefix is stripped (reports.mermaid_diagram.nid).
_MERMAID_ID_CHARS = ":-./ "


def _mermaid_id(col: Column) -> Column:
    return F.translate(
        F.replace(col, F.lit("ont:"), F.lit("")),
        _MERMAID_ID_CHARS,
        "_" * len(_MERMAID_ID_CHARS),
    )


def changelog_lines(changes: DataFrame) -> DataFrame:
    """One markdown bullet per diff change row — the body of
    `reports.changelog_markdown`'s Added/Removed/Modified sections
    (section headers and the version preamble are constants the sink
    prepends).

    Returns (section, path, line); sorting by (section, path) within a
    section reproduces the driver function's `sorted(rows, key=path)`
    order.
    """
    old = F.coalesce(F.col("old_value"), F.lit(""))
    new = F.coalesce(F.col("new_value"), F.lit(""))
    detail = F.when(
        F.coalesce(F.col("details"), F.lit("")) != "",
        F.concat(F.lit(" — "), F.col("details")),
    ).otherwise(F.lit(""))
    val = F.coalesce(
        F.nullif(new, F.lit("")), F.nullif(old, F.lit("")), F.lit("")
    )
    line = F.when(
        F.col("change_type") == "modified",
        F.concat(
            F.lit("- `"), F.col("path"), F.lit("`: "),
            old, F.lit(" → "), new, detail,
        ),
    ).otherwise(
        F.concat(
            F.lit("- `"), F.col("path"), F.lit("` ("),
            F.col("element_type"), F.lit("): "), val, detail,
        )
    )
    return changes.select(
        F.initcap("change_type").alias("section"),
        F.col("path"),
        line.alias("line"),
    )


def recommendation_lines(conflicts: DataFrame) -> DataFrame:
    """Distributed twin of `reports.recommendations_from_conflicts`
    (reference: semantic_debt.py:532-568): the same rule-based tips,
    fired from a single aggregate over the conflicts frame (needs
    `severity` and `conflict_type` columns) instead of a collected
    list.  One global aggregate row, then a when-chain — no collect.

    Returns a one-column (tip) frame; an empty conflicts frame yields
    the driver twin's "no conflicts" row.
    """
    agg = conflicts.agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("severity") == "CRITICAL", 1)).alias("crit"),
        F.count(F.when(F.col("severity") == "WARNING", 1)).alias("warn"),
        F.max(
            (F.col("conflict_type") == "type_conflict").cast("int")
        ).alias("has_type"),
        F.max(
            (F.col("conflict_type") == "entity_conflict").cast("int")
        ).alias("has_entity"),
        F.max(
            (F.col("conflict_type") == "rule_conflict").cast("int")
        ).alias("has_rule"),
    )
    tips = F.array_compact(
        F.array(
            F.when(
                F.col("total") == 0,
                F.lit("No semantic conflicts detected. Good job!"),
            ),
            F.when(
                F.col("crit") > 0,
                F.concat(
                    F.lit("Address "),
                    F.col("crit").cast("string"),
                    F.lit(
                        " critical conflict(s) immediately - they may "
                        "cause data inconsistencies."
                    ),
                ),
            ),
            F.when(
                F.col("has_type") == 1,
                F.lit(
                    "Create a shared data dictionary to standardize "
                    "property types across dashboards."
                ),
            ),
            F.when(
                F.col("has_entity") == 1,
                F.lit(
                    "Consider creating a master ontology schema that all "
                    "dashboards inherit from."
                ),
            ),
            F.when(
                F.col("has_rule") == 1,
                F.lit(
                    "Centralize business rules in a single repository to "
                    "ensure consistency."
                ),
            ),
            F.when(
                F.col("warn") > 3,
                F.lit(
                    "Schedule a semantic alignment review with "
                    "stakeholders from different dashboard teams."
                ),
            ),
        )
    )
    return agg.select(F.explode(tips).alias("tip"))


def debt_report_lines(
    conflicts: DataFrame,
    duplications: DataFrame,
    canonical: DataFrame,
) -> DataFrame:
    """Distributed twin of `reports.html_debt_report`'s three per-item
    sections (reference: analyzer.py:343-420): the conflict divs, the
    duplication divs and the canonical-suggestion table rows, rendered
    as codegen concat expressions so a corpus-wide report body can be
    written as a text sink.  The page head/footer and the total-debt
    box are constants + one aggregate the sink prepends (driver twin
    stays the literal-parity surface — tests/test_reports.py).

    Inputs are the unmodified `measure_conflicts`, `duplicate_logic`
    and `canonical_definitions` frames.  The `{confidence:.0%}` cell
    uses HALF_EVEN decimal rounding in all three renderers (Python
    format / Java format_number / C printf agree on exact doubles).

    Returns (section, line) with section ∈ {'conflict', 'duplication',
    'canonical'}.
    """
    conflict_lines = conflicts.select(
        F.lit("conflict").alias("section"),
        F.concat(
            F.lit('\n    <div class="conflict">\n        <h3>'),
            F.col("concept"),
            F.lit("</h3>\n        <p><strong>Severity:</strong> "),
            F.col("severity"),
            F.lit("</p>\n        <p><strong>"),
            F.col("dashboard1"),
            F.lit(":</strong> "),
            F.col("definition1"),
            F.lit("</p>\n        <p><strong>"),
            F.col("dashboard2"),
            F.lit(":</strong> "),
            F.col("definition2"),
            F.lit("</p>\n        <p>"),
            F.col("description"),
            F.lit("</p>\n    </div>"),
        ).alias("line"),
    )
    dup_lines = duplications.select(
        F.lit("duplication").alias("section"),
        F.concat(
            F.lit('\n    <div class="duplication">\n        <h3>'),
            F.col("measure_name"),
            F.lit("</h3>\n        <p><strong>Dashboards:</strong> "),
            F.array_join("dashboards", ", "),
            F.lit("</p>\n        <p><strong>Formula:</strong> <code>"),
            F.col("dax_formula"),
            F.lit("</code></p>\n        <p>"),
            F.col("description"),
            F.lit("</p>\n    </div>"),
        ).alias("line"),
    )
    canon_lines = canonical.select(
        F.lit("canonical").alias("section"),
        F.concat(
            F.lit("\n        <tr>\n            <td>"),
            F.col("name"),
            F.lit("</td>\n            <td><code>"),
            F.substring(F.col("suggested_definition"), 1, 100),
            F.lit("...</code></td>\n            <td>"),
            F.format_number(F.col("confidence") * 100, 0),
            F.lit("%</td>\n            <td>"),
            F.size("dashboards_using").cast("string"),
            F.lit("</td>\n        </tr>"),
        ).alias("line"),
    )
    return conflict_lines.unionByName(dup_lines).unionByName(canon_lines)


def mermaid_lines(
    nodes: DataFrame, edges: DataFrame, max_nodes: int = 60
) -> DataFrame:
    """Node/edge declaration lines of `reports.mermaid_diagram` for the
    first `max_nodes` nodes by name (the driver twin truncates the
    collected list the same way when fed name-sorted rows; the `graph
    TD` header is a constant the sink prepends).

    The kept-node set is a top-k (TakeOrderedAndProject) and both edge
    semi-joins broadcast it, so the render never shuffles `edges`.

    A diagram declares each element once: node identity is the node
    NAME (rows for the same node across datasets collapse to the
    min non-null type — deterministic), and duplicate rendered lines
    (the same edge present in several datasets) are dropped.

    Returns (kind, line) with kind ∈ {'node', 'edge'}.
    """
    keep = (
        nodes.groupBy("node")
        .agg(F.min("node_type").alias("node_type"))
        .orderBy("node")
        .limit(max_nodes)
    )
    label = F.replace(F.col("node"), F.lit("ont:"), F.lit(""))
    shape = F.when(
        F.col("node_type") == "owl:Class",
        F.concat(_mermaid_id(F.col("node")), F.lit('[("'), label, F.lit('")]')),
    ).otherwise(
        F.concat(_mermaid_id(F.col("node")), F.lit('["'), label, F.lit('"]'))
    )
    node_lines = keep.select(
        F.lit("node").alias("kind"),
        F.concat(F.lit("    "), shape).alias("line"),
    )
    kept_ids = keep.select("node")
    rel = F.replace(
        F.replace(F.col("rel"), F.lit("ont:"), F.lit("")),
        F.lit("rdfs:"),
        F.lit(""),
    )
    edge_lines = (
        edges.join(
            F.broadcast(kept_ids.withColumnRenamed("node", "src")), "src"
        )
        .join(F.broadcast(kept_ids.withColumnRenamed("node", "dst")), "dst")
        .select(
            F.lit("edge").alias("kind"),
            F.concat(
                F.lit("    "),
                _mermaid_id(F.col("src")),
                F.lit(" -->|"), rel, F.lit("| "),
                _mermaid_id(F.col("dst")),
            ).alias("line"),
        )
    )
    return node_lines.unionByName(edge_lines).dropDuplicates(
        ["kind", "line"]
    )
