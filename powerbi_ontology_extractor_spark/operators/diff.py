"""Git-like ontology diff + three-way merge as set algebra over
DataFrames.

Reference semantics: /root/reference/powerbi_ontology/ontology_diff.py
— dict-keyed add/remove/modify walks (:240-574) and an
added-from-theirs three-way merge (:601-720).  Here each family is one
full-outer join; the whole corpus (every (repo, dataset) pair) diffs in
a single job instead of one Python process per ontology pair.

Change row: keys… + (change_type, element_type, element_name, path,
old_value, new_value, details) — field-for-field the reference's
``Change`` record (:46-68).

Scale notes: joins shuffle on (keys, element-key); properties are
semi-joined to common entities first (the reference never reports
properties of added/removed entities).  ``stack``-style explosion of
per-field modifications happens after the join (narrow).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHANGE_COLS = [
    "change_type",
    "element_type",
    "element_name",
    "path",
    "old_value",
    "new_value",
    "details",
]


def _fmt(*parts: Column | str) -> Column:
    return F.concat(*[F.lit(p) if isinstance(p, str) else p for p in parts])


def _outer(
    src: DataFrame, tgt: DataFrame, keys: Sequence[str], on: Sequence[str]
) -> DataFrame:
    """Full-outer join with side-prefixed columns (s_*, t_*) plus the
    coalesced join keys under their plain names."""
    a = src.select([F.col(c).alias(f"s_{c}") for c in src.columns])
    b = tgt.select([F.col(c).alias(f"t_{c}") for c in tgt.columns])
    cond = [
        F.col(f"s_{k}").eqNullSafe(F.col(f"t_{k}")) for k in [*keys, *on]
    ]
    joined = a.join(b, cond, "full_outer")
    merged = [
        F.coalesce(F.col(f"s_{k}"), F.col(f"t_{k}")).alias(k)
        for k in [*keys, *on]
    ]
    return joined.select(*merged, *[c for c in joined.columns])


def _emit(
    df: DataFrame,
    keys: Sequence[str],
    specs: list[tuple[Column, str, Column, Column, Column, Column, Column]],
) -> DataFrame:
    structs = F.array_compact(
        F.array(
            *[
                F.when(
                    cond,
                    F.struct(
                        F.lit(ctype).alias("change_type"),
                        etype.alias("element_type"),
                        name.alias("element_name"),
                        path.alias("path"),
                        old.alias("old_value"),
                        new.alias("new_value"),
                        F.coalesce(details, F.lit("")).alias("details"),
                    ),
                )
                for (cond, ctype, etype, name, path, old, new, details) in specs
            ]
        )
    )
    return df.select(*keys, F.explode(structs).alias("c")).select(*keys, "c.*")


def diff_entities(
    src_entities: DataFrame,
    tgt_entities: DataFrame,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Entity add/remove + entity_type/description modifications
    (ontology_diff.py:240-321)."""
    j = _outer(src_entities, tgt_entities, keys, ["entity"])
    s, t = F.col("s_entity"), F.col("t_entity")
    lit_e = F.lit("entity")

    def summary(side: str) -> Column:
        return _fmt(
            "type=",
            F.col(f"{side}_entity_type"),
            ", properties=",
            F.col(f"{side}_n_properties").cast("string"),
        )

    return _emit(
        j,
        keys,
        [
            (s.isNull(), "added", lit_e, t, t, F.lit(None), summary("t"),
             F.col("t_description")),
            (t.isNull(), "removed", lit_e, s, s, summary("s"), F.lit(None),
             F.col("s_description")),
            (
                s.isNotNull() & t.isNotNull()
                & ~F.col("s_entity_type").eqNullSafe(F.col("t_entity_type")),
                "modified", lit_e, s, _fmt(s, ".entity_type"),
                F.col("s_entity_type"), F.col("t_entity_type"),
                F.lit("Entity type changed"),
            ),
            (
                s.isNotNull() & t.isNotNull()
                & ~F.col("s_description").eqNullSafe(F.col("t_description")),
                "modified", lit_e, s, _fmt(s, ".description"),
                F.col("s_description"), F.col("t_description"),
                F.lit("Description updated"),
            ),
        ],
    )


def diff_properties(
    src_props: DataFrame,
    tgt_props: DataFrame,
    src_entities: DataFrame,
    tgt_entities: DataFrame,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Property add/remove/modify within entities common to both sides
    (ontology_diff.py:304-391)."""
    common = src_entities.select(*keys, "entity").join(
        tgt_entities.select(*keys, "entity"), [*keys, "entity"], "inner"
    )
    sp = src_props.join(common, [*keys, "entity"], "left_semi")
    tp = tgt_props.join(common, [*keys, "entity"], "left_semi")
    j = _outer(sp, tp, keys, ["entity", "property"])
    s, t = F.col("s_property"), F.col("t_property")
    lit_p = F.lit("property")
    path = _fmt(F.col("entity"), ".", F.col("property"))

    def summary(side: str) -> Column:
        return _fmt(
            "type=",
            F.col(f"{side}_data_type"),
            ", required=",
            F.initcap(F.col(f"{side}_required").cast("string")),
        )

    def field_change(field: str, detail: str, as_str=lambda c: c):
        sc, tc = F.col(f"s_{field}"), F.col(f"t_{field}")
        return (
            s.isNotNull() & t.isNotNull() & ~sc.eqNullSafe(tc),
            "modified", lit_p, F.col("property"), _fmt(path, f".{field}"),
            as_str(sc), as_str(tc), F.lit(detail),
        )

    as_bool_str = lambda c: F.initcap(c.cast("string"))
    return _emit(
        j,
        keys,
        [
            (s.isNull(), "added", lit_p, t, path, F.lit(None), summary("t"),
             F.col("t_description")),
            (t.isNull(), "removed", lit_p, s, path, summary("s"), F.lit(None),
             F.col("s_description")),
            field_change("data_type", "Data type changed"),
            field_change("required", "Required flag changed", as_bool_str),
            field_change("unique", "Unique flag changed", as_bool_str),
        ],
    )


def diff_relationships(
    src_rels: DataFrame, tgt_rels: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Relationship add/remove/modify keyed on from→to
    (ontology_diff.py:393-461)."""
    key = F.concat_ws("→", "from_entity", "to_entity")
    sp = src_rels.withColumn("rel_key", key)
    tp = tgt_rels.withColumn("rel_key", key)
    j = _outer(sp, tp, keys, ["rel_key"])
    s, t = F.col("s_rel_key"), F.col("t_rel_key")
    lit_r = F.lit("relationship")

    def summary(side: str) -> Column:
        return _fmt(
            "type=",
            F.col(f"{side}_relationship_type"),
            ", cardinality=",
            F.col(f"{side}_cardinality"),
        )

    return _emit(
        j,
        keys,
        [
            (s.isNull(), "added", lit_r, t, t, F.lit(None), summary("t"),
             F.col("t_description")),
            (t.isNull(), "removed", lit_r, s, s, summary("s"), F.lit(None),
             F.col("s_description")),
            (
                s.isNotNull() & t.isNotNull()
                & ~F.col("s_relationship_type").eqNullSafe(
                    F.col("t_relationship_type")
                ),
                "modified", lit_r, F.col("rel_key"),
                _fmt(F.col("rel_key"), ".type"),
                F.col("s_relationship_type"), F.col("t_relationship_type"),
                F.lit("Relationship type changed"),
            ),
            (
                s.isNotNull() & t.isNotNull()
                & ~F.col("s_cardinality").eqNullSafe(F.col("t_cardinality")),
                "modified", lit_r, F.col("rel_key"),
                _fmt(F.col("rel_key"), ".cardinality"),
                F.col("s_cardinality"), F.col("t_cardinality"),
                F.lit("Cardinality changed"),
            ),
        ],
    )


def diff_rules(
    src_rules: DataFrame, tgt_rules: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Business-rule add/remove/modify keyed on name
    (ontology_diff.py:463-534)."""
    j = _outer(
        src_rules.select(*keys, "name", "condition", "action",
                         "classification", "description"),
        tgt_rules.select(*keys, "name", "condition", "action",
                         "classification", "description"),
        keys,
        ["name"],
    )
    s, t = F.col("s_name"), F.col("t_name")
    lit_r = F.lit("rule")
    path = _fmt("rule:", F.col("name"))

    def summary(side: str) -> Column:
        return _fmt(
            "condition=", F.col(f"{side}_condition"),
            ", action=", F.col(f"{side}_action"),
        )

    def field_change(field: str, detail: str):
        sc, tc = F.col(f"s_{field}"), F.col(f"t_{field}")
        return (
            s.isNotNull() & t.isNotNull() & ~sc.eqNullSafe(tc),
            "modified", lit_r, F.col("name"), _fmt(path, f".{field}"),
            sc, tc, F.lit(detail),
        )

    return _emit(
        j,
        keys,
        [
            (s.isNull(), "added", lit_r, t, path, F.lit(None), summary("t"),
             F.col("t_description")),
            (t.isNull(), "removed", lit_r, s, path, summary("s"), F.lit(None),
             F.col("s_description")),
            field_change("condition", "Condition changed"),
            field_change("action", "Action changed"),
            field_change("classification", "Classification changed"),
        ],
    )


def diff_metadata(
    src_meta: DataFrame, tgt_meta: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Metadata key/value diff (ontology_diff.py:536-574).
    Inputs: (keys…, key, value)."""
    j = _outer(src_meta, tgt_meta, keys, ["key"])
    s, t = F.col("s_key"), F.col("t_key")
    lit_m = F.lit("metadata")
    path = _fmt("metadata:", F.col("key"))
    return _emit(
        j,
        keys,
        [
            (s.isNull(), "added", lit_m, t, path, F.lit(None),
             F.col("t_value"), F.lit("")),
            (t.isNull(), "removed", lit_m, s, path, F.col("s_value"),
             F.lit(None), F.lit("")),
            (
                s.isNotNull() & t.isNotNull()
                & ~F.col("s_value").eqNullSafe(F.col("t_value")),
                "modified", lit_m, F.col("key"), path,
                F.col("s_value"), F.col("t_value"), F.lit(""),
            ),
        ],
    )


def diff_ontologies(
    src: dict[str, DataFrame],
    tgt: dict[str, DataFrame],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Full diff (ontology_diff.py:217-238): entities → properties →
    relationships → rules → metadata, unioned into one changes DF."""
    changes = diff_entities(src["entities"], tgt["entities"], keys)
    changes = changes.unionByName(
        diff_properties(
            src["properties"], tgt["properties"],
            src["entities"], tgt["entities"], keys,
        )
    )
    changes = changes.unionByName(
        diff_relationships(src["relationships"], tgt["relationships"], keys)
    )
    if "business_rules" in src and "business_rules" in tgt:
        changes = changes.unionByName(
            diff_rules(src["business_rules"], tgt["business_rules"], keys)
        )
    if "metadata" in src and "metadata" in tgt:
        changes = changes.unionByName(
            diff_metadata(src["metadata"], tgt["metadata"], keys)
        )
    return changes


def diff_summary(changes: DataFrame, keys: Sequence[str] = ()) -> DataFrame:
    """Counts by change_type × element_type (ontology_diff.py:84-97)."""
    return changes.cube(*keys, "change_type", "element_type").count()


def diff_all_pairs(
    families: dict[str, DataFrame],
    pair_col: str = "repo",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Diff every ordered ontology pair in ONE job — the cross-dashboard
    analog of the reference CLI's per-pair Python loop
    (cli.py:137-154), re-expressed as a join fan-out so the cluster
    sees one DAG instead of O(P²) driver-scheduled jobs.

    Each family frame must carry ``pair_col`` (the ontology identity,
    default ``repo``).  ``pairs`` restricts which (src, tgt) pairs are
    diffed; by default all ``src < tgt`` pairs of the distinct keys in
    ``families["entities"]``.

    Scale note: all-pairs is inherently quadratic in ontologies — each
    family row is replicated once per pair it participates in.  At
    corpus scale pass an explicit ``pairs`` frame (e.g. the candidate
    pairs from canonicalize.py's MinHash-LSH blocking, or a
    same-org/same-team catalog join) so the fan-out is linear in the
    candidate set; the pair list is broadcast either way.

    PRECONDITION: each ``pair_col`` value identifies ONE ontology —
    the diff keys are (src_repo, tgt_repo) only, so if a single repo
    carried several datasets their same-named elements would full-outer
    join across datasets and emit spurious changes.  The ontology
    families extracted from the synthetic corpus satisfy this (each
    repo has one model dataset; its Standalone DAX rows produce no
    ontology elements); for genuinely multi-dataset inputs pass a
    composite identity as ``pair_col`` (e.g.
    ``concat_ws('/', repo, dataset)``) instead.

    Returns (src_repo, tgt_repo) + CHANGE_COLS.
    """
    keys = ["src_repo", "tgt_repo"]
    if pairs is None:
        ids = families["entities"].select(pair_col).distinct()
        pairs = (
            ids.select(F.col(pair_col).alias("src_repo"))
            .crossJoin(ids.select(F.col(pair_col).alias("tgt_repo")))
            .where(F.col("src_repo") < F.col("tgt_repo"))
        )
    pairs = pairs.select("src_repo", "tgt_repo")

    def bind(df: DataFrame, side: str) -> DataFrame:
        return df.join(
            F.broadcast(pairs), df[pair_col] == F.col(side), "inner"
        ).drop(pair_col)

    src = {k: bind(df, "src_repo") for k, df in families.items()}
    tgt = {k: bind(df, "tgt_repo") for k, df in families.items()}
    return diff_ontologies(src, tgt, keys)


# --- three-way merge ---------------------------------------------------------


def merge_conflicts(
    our_changes: DataFrame, their_changes: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Paths changed on both sides = conflicts
    (ontology_diff.py:617-618): inner join on path."""
    a = our_changes.select(*keys, "path", "element_type").dropDuplicates()
    b = their_changes.select(*keys, "path").dropDuplicates()
    return a.join(b, [*keys, "path"], "inner")


def merge_element_family(
    ours: DataFrame,
    theirs: DataFrame,
    their_changes: DataFrame,
    conflicts: DataFrame,
    element_type: str,
    element_key: Sequence[str],
    keys: Sequence[str] = (),
) -> DataFrame:
    """ours ∪ (theirs-ADDED elements whose path isn't conflicting) —
    the reference merge strategy for every family
    (ontology_diff.py:642-720, ours-priority)."""
    added = (
        their_changes.where(
            (F.col("element_type") == element_type)
            & (F.col("change_type") == "added")
        )
        .select(*keys, F.col("element_name"), "path")
        .join(conflicts.select(*keys, "path"), [*keys, "path"], "left_anti")
        .select(*keys, "element_name")
    )
    key_expr = (
        F.concat_ws("→", *[F.col(c) for c in element_key])
        if len(element_key) > 1
        else F.col(element_key[0])
    )
    theirs_new = theirs.withColumn("_ek", key_expr).join(
        added.withColumnRenamed("element_name", "_ek"), [*keys, "_ek"], "left_semi"
    ).drop("_ek")
    return ours.unionByName(theirs_new)


def merge_ontologies(
    base: dict[str, DataFrame],
    ours: dict[str, DataFrame],
    theirs: dict[str, DataFrame],
    keys: Sequence[str] = (),
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Three-way merge (ontology_diff.py:601-640): diff(base,ours) ×
    diff(base,theirs) → conflicts; additions from theirs unioned into
    ours unless conflicting.  Returns (merged family dict, conflicts)."""
    our_changes = diff_ontologies(base, ours, keys)
    their_changes = diff_ontologies(base, theirs, keys)
    conflicts = merge_conflicts(our_changes, their_changes, keys)

    merged = {
        "entities": merge_element_family(
            ours["entities"], theirs["entities"], their_changes, conflicts,
            "entity", ["entity"], keys,
        ),
        "relationships": merge_element_family(
            ours["relationships"], theirs["relationships"], their_changes,
            conflicts, "relationship", ["from_entity", "to_entity"], keys,
        ),
        "business_rules": merge_element_family(
            ours["business_rules"], theirs["business_rules"], their_changes,
            conflicts, "rule", ["name"], keys,
        ),
    }
    # properties follow their merged entities: ours' props + props of
    # entities newly adopted from theirs
    adopted = merged["entities"].join(
        ours["entities"].select(*keys, "entity"), [*keys, "entity"], "left_anti"
    )
    merged["properties"] = ours["properties"].unionByName(
        theirs["properties"].join(adopted, [*keys, "entity"], "left_semi")
    )
    if "metadata" in base:
        # precedence base < theirs < ours (ontology_diff.py:632-637)
        ranked = (
            base["metadata"].withColumn("_pri", F.lit(0))
            .unionByName(theirs["metadata"].withColumn("_pri", F.lit(1)))
            .unionByName(ours["metadata"].withColumn("_pri", F.lit(2)))
        )
        merged["metadata"] = (
            ranked.groupBy(*keys, "key")
            .agg(F.max_by("value", "_pri").alias("value"))
        )
    return merged, conflicts
