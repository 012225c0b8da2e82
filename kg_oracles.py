"""DuckDB oracle SQL for the KG-pipeline driver queries.

Each function returns ONE DuckDB SELECT that *independently* recomputes
a kg_* query's result from the corpus parquet fixture (written by
``sources.corpus.write_corpus_parquet`` — byte-identical input for both
engines).  The SQL re-implements the reference emission grammar
(/root/reference/powerbi_ontology/export/owl.py and the DAX-rule regex
subset, dax_parser.py:112-317) with DuckDB JSON/regexp/list functions —
no Spark result is consumed, so a hash match is a genuine two-engine
agreement on the grammar.

Known intentional simplifications (all count-neutral on any corpus this
fixture generates; noted inline too):
- bnode IRIs use an injective concat key instead of sha1 (DuckDB 1.0 has
  no sha1); bnodes only need set-distinctness, never value equality.
- names in this corpus are never NULL/empty, so ``safe_name``'s
  'unnamed' fallback is elided.
- the THRESHOLD rule's "field not mentioned by any earlier rule" guard
  checks core-rule conditions but not earlier *threshold* conditions
  (order-dependent in the reference); model expressions in the fixture
  produce zero threshold matches either way (the ``]`` before the
  operator blocks the regex — a reference quirk preserved by the
  engine).
"""

from __future__ import annotations

_MODEL_STRUCT = (
    '{"name":"VARCHAR",'
    '"tables":[{"name":"VARCHAR","description":"VARCHAR",'
    '"columns":[{"name":"VARCHAR","dataType":"VARCHAR","isKey":"BOOLEAN",'
    '"isUnique":"BOOLEAN","isNullable":"BOOLEAN","description":"VARCHAR"}],'
    '"measures":[{"name":"VARCHAR","expression":"VARCHAR",'
    '"displayFolder":"VARCHAR","description":"VARCHAR"}]}],'
    '"relationships":[{"name":"VARCHAR","fromTable":"VARCHAR",'
    '"fromColumn":"VARCHAR","toTable":"VARCHAR","toColumn":"VARCHAR",'
    '"fromCardinality":"VARCHAR","toCardinality":"VARCHAR",'
    '"crossFilteringBehavior":"VARCHAR","isActive":"BOOLEAN"}],'
    '"roles":[{"name":"VARCHAR","tablePermissions":[{"name":"VARCHAR",'
    '"filterExpression":"VARCHAR"}]}]}'
)

_SIDECAR_STRUCT = (
    '{"dataset":"VARCHAR","entities":[{"name":"VARCHAR",'
    '"properties":[{"name":"VARCHAR","constraints":[{"type":"VARCHAR",'
    '"pattern":"VARCHAR","min":"DOUBLE","max":"DOUBLE","values":["VARCHAR"],'
    '"target":"VARCHAR","value":"VARCHAR","message":"VARCHAR"}]}],'
    '"constraints":[{"type":"VARCHAR","value":"VARCHAR",'
    '"message":"VARCHAR"}]}]}'
)


def _safe(expr: str) -> str:
    """owl.py:494-498 safe_name (names in the fixture are never empty,
    so the 'unnamed' fallback is elided)."""
    return f"translate({expr}, ' -.', '___')"


def _norm_ws(expr: str) -> str:
    """dax.py _norm_condition: collapse whitespace runs, strip."""
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def _sanitize(expr: str) -> str:
    """owl.py:473-492 sanitize_dax: strip NUL/semicolons, cap 10000."""
    return f"substr(regexp_replace({expr}, '[\\x00;]', '', 'g'), 1, 10000)"


# shared prelude: corpus → parsed model rows + flattened family frames
def _prelude(corpus_path: str) -> str:
    datekw = (
        "(lower(coalesce(c.name,'')) LIKE '%year%' OR "
        "lower(coalesce(c.name,'')) LIKE '%month%' OR "
        "lower(coalesce(c.name,'')) LIKE '%day%' OR "
        "lower(coalesce(c.name,'')) LIKE '%quarter%' OR "
        "lower(coalesce(c.name,'')) LIKE '%week%')"
    )
    return f"""
corpus AS (SELECT * FROM read_parquet('{corpus_path}')),
model AS (
    SELECT repo, path,
           coalesce(m.name, 'Unknown') AS dataset, m
    FROM (SELECT repo, path,
                 json_transform(
                     coalesce(json_extract(content, '$.model'), content::JSON),
                     '{_MODEL_STRUCT}') AS m
          FROM corpus WHERE lang = 'model_json')),
tbl AS (
    SELECT repo, dataset, coalesce(m.relationships, []) AS rels,
           unnest(coalesce(m.tables, [])) AS t
    FROM model),
ent AS (
    SELECT repo, dataset,
           coalesce(t.name, 'Unknown') AS entity,
           coalesce(t.description, '') AS descr,
           coalesce(t.columns, []) AS cols,
           coalesce(t.measures, []) AS msrs,
           len(coalesce(t.columns, [])) AS n_props,
           len(coalesce(t.measures, [])) AS measure_count,
           len(list_filter(rels, r ->
               coalesce(r.fromTable,'') = coalesce(t.name,'Unknown') OR
               coalesce(r.toTable,'') = coalesce(t.name,'Unknown'))) AS degree,
           len(list_filter(coalesce(t.columns, []), c -> {datekw})) > 0
               AS has_date_cols
    FROM tbl),
ent2 AS (
    -- pattern precedence fact > dimension > date_table > date > standard
    -- (ontology_generator.py:258-312,368-406)
    SELECT *,
           (lower(entity) LIKE '%date%' OR lower(entity) LIKE '%calendar%'
            OR lower(entity) LIKE '%time%') AS datey,
           CASE WHEN measure_count > 0 AND degree <= 3 THEN 'fact'
                WHEN degree >= 3 AND n_props < 20 THEN 'dimension'
                WHEN (lower(entity) LIKE '%date%' OR lower(entity) LIKE
                      '%calendar%' OR lower(entity) LIKE '%time%')
                     AND has_date_cols THEN 'date_table'
                WHEN (lower(entity) LIKE '%date%' OR lower(entity) LIKE
                      '%calendar%' OR lower(entity) LIKE '%time%') THEN 'date'
                ELSE 'standard' END AS entity_type
    FROM ent),
prop AS (
    -- extractor.py:171-180 property flattening + type map (:333-343)
    SELECT repo, dataset, entity,
           coalesce(c.name, '') AS pname,
           coalesce(c.description, '') AS pdescr,
           CASE lower(coalesce(c.dataType, 'string'))
                WHEN 'string' THEN 'String' WHEN 'int64' THEN 'Integer'
                WHEN 'double' THEN 'Decimal' WHEN 'datetime' THEN 'Date'
                WHEN 'boolean' THEN 'Boolean' WHEN 'decimal' THEN 'Decimal'
                ELSE 'String' END AS otype,
           coalesce(c.isNullable = FALSE, FALSE) AS required,
           (coalesce(c.isUnique, FALSE) OR coalesce(c.isKey, FALSE)) AS uniq
    FROM (SELECT repo, dataset, entity, unnest(cols) AS c FROM ent)),
rel AS (
    -- cardinality normalize (extractor.py:216-229) + semantic type
    -- (ontology_generator.py:376-398)
    SELECT repo, dataset,
           coalesce(r.fromTable, '') AS from_e,
           coalesce(r.fromColumn, '') AS from_p,
           coalesce(r.toTable, '') AS to_e,
           coalesce(r.toColumn, '') AS to_p,
           CASE WHEN r.fromCardinality = 'one' AND r.toCardinality = 'many'
                     THEN 'one-to-many'
                WHEN r.fromCardinality = 'one' AND r.toCardinality = 'one'
                     THEN 'one-to-one'
                WHEN r.fromCardinality = 'many' AND r.toCardinality = 'many'
                     THEN 'many-to-many'
                ELSE 'many-to-one' END AS card,
           coalesce(r.name, coalesce(r.fromTable,'') || '_' ||
                    coalesce(r.toTable,'')) AS src_rel
    FROM (SELECT repo, dataset, unnest(coalesce(m.relationships, [])) AS r
          FROM model)),
rel2 AS (
    SELECT *,
           CASE WHEN lower(from_e) LIKE '%customer%' AND lower(to_e) LIKE
                     '%order%' THEN 'has'
                WHEN lower(from_e) LIKE '%order%' AND lower(to_e) LIKE
                     '%customer%' THEN 'belongs_to'
                WHEN lower(from_e) LIKE '%product%' AND lower(to_e) LIKE
                     '%order%' THEN 'contained_in'
                WHEN lower(from_e) LIKE '%shipment%' AND lower(to_e) LIKE
                     '%customer%' THEN 'belongs_to'
                WHEN card = 'one-to-many' THEN 'has'
                WHEN card = 'many-to-one' THEN 'belongs_to'
                ELSE 'related_to' END AS rel_type
    FROM rel),
msr AS (
    SELECT repo, dataset, entity AS tbl,
           coalesce(mm.name, '') AS mname,
           coalesce(mm.expression, '') AS expr,
           coalesce(mm.description, '') AS mdescr
    FROM (SELECT repo, dataset, entity, unnest(msrs) AS mm FROM ent)),
perm AS (
    SELECT repo, dataset, role, coalesce(p.name, '') AS ptable,
           coalesce(p.filterExpression, '') AS pfilter
    FROM (SELECT repo, dataset, coalesce(ro.name, '') AS role,
                 unnest(coalesce(ro.tablePermissions, [])) AS p
          FROM (SELECT repo, dataset, unnest(coalesce(m.roles, [])) AS ro
                FROM model))
    WHERE coalesce(p.filterExpression, '') <> ''),
repo_ds AS (SELECT DISTINCT repo, dataset FROM model)
"""


# DAX rule extraction (dax.py extract_rules / dax_parser.py:112-260):
# CALCULATE / IF / SWITCH / THRESHOLD over model measures.
_RULES = r"""
calc_rules AS (
    SELECT repo, dataset, tbl, mname, mdescr,
           mname || '_Filter' AS rule_name,
           trim(regexp_replace(cond0, '\s+', ' ', 'g')) AS cond,
           'filter' AS action, '' AS classification,
           'Filter condition from ' || mname || ': ' ||
               trim(regexp_replace(cond0, '\s+', ' ', 'g')) AS rdescr
    FROM (SELECT *, unnest(regexp_extract_all(expr,
              'CALCULATE\s*\([^,]+,\s*([^)]+)\)', 1, 'i')) AS cond0
          FROM msr)
    WHERE trim(regexp_replace(cond0, '\s+', ' ', 'g')) <> ''),
if_m AS (
    SELECT *,
           regexp_extract_all(expr, 'IF\s*\(\s*([^,]+),\s*([^,]+),\s*([^)]+)\)', 1, 'i') AS g1,
           regexp_extract_all(expr, 'IF\s*\(\s*([^,]+),\s*([^,]+),\s*([^)]+)\)', 2, 'i') AS g2,
           regexp_extract_all(expr, 'IF\s*\(\s*([^,]+),\s*([^,]+),\s*([^)]+)\)', 3, 'i') AS g3
    FROM msr),
if_rules AS (
    SELECT repo, dataset, tbl, mname, mdescr,
           mname || '_Condition' AS rule_name,
           trim(regexp_replace(g1[i], '\s+', ' ', 'g')) AS cond,
           'classify_as_' || lower(replace(replace(trim(g2[i]), '"', ''),
               ' ', '_')) AS action,
           trim(replace(trim(g2[i]), '"', '')) AS classification,
           'IF condition: ' || trim(regexp_replace(g1[i], '\s+', ' ', 'g')) ||
               ' then ' || trim(g2[i]) || ' else ' || trim(g3[i]) AS rdescr
    FROM if_m, unnest(range(1, len(g1) + 1)) AS _(i)
    WHERE trim(regexp_replace(g1[i], '\s+', ' ', 'g')) <> ''),
sw_m AS (
    SELECT *, list_transform(string_split(body, ','), s -> trim(s)) AS parts
    FROM (SELECT *, unnest(regexp_extract_all(expr,
              'SWITCH\s*\([^,]+,\s*([^)]+)\)', 1, 'i')) AS body
          FROM msr)),
sw_rules AS (
    SELECT repo, dataset, tbl, mname, mdescr,
           mname || '_Switch_' || replace(replace(parts[i+1], '"', ''), ' ',
               '_') AS rule_name,
           trim(regexp_replace(parts[i], '\s+', ' ', 'g')) AS cond,
           'classify_as_' || lower(replace(replace(parts[i+1], '"', ''),
               ' ', '_')) AS action,
           trim(replace(parts[i+1], '"', '')) AS classification,
           'SWITCH case: ' || trim(regexp_replace(parts[i], '\s+', ' ', 'g'))
               || ' -> ' || parts[i+1] AS rdescr
    FROM sw_m, unnest(range(1, len(parts), 2)) AS _(i)
    WHERE trim(regexp_replace(parts[i], '\s+', ' ', 'g')) <> ''),
core_rules AS (
    SELECT * FROM calc_rules UNION ALL
    SELECT * FROM if_rules UNION ALL
    SELECT * FROM sw_rules),
th_m AS (
    SELECT *,
           regexp_extract_all(expr, '(\w+)\s*(>|<|>=|<=|=)\s*(\d+\.?\d*)', 1) AS tf,
           regexp_extract_all(expr, '(\w+)\s*(>|<|>=|<=|=)\s*(\d+\.?\d*)', 2) AS toper,
           regexp_extract_all(expr, '(\w+)\s*(>|<|>=|<=|=)\s*(\d+\.?\d*)', 3) AS tv
    FROM msr),
th_rules AS (
    -- guard: field already mentioned by a core rule of the same measure
    SELECT t.repo, t.dataset, t.tbl, t.mname, t.mdescr,
           t.mname || '_Threshold' AS rule_name,
           t.tf[i] || ' ' || t.toper[i] || ' ' || t.tv[i] AS cond,
           'threshold_check' AS action, '' AS classification,
           'Threshold condition: ' || t.tf[i] || ' ' || t.toper[i] || ' ' ||
               t.tv[i] AS rdescr
    FROM th_m t, unnest(range(1, len(t.tf) + 1)) AS _(i)
    WHERE NOT EXISTS (
        SELECT 1 FROM core_rules r
        WHERE r.repo = t.repo AND r.dataset = t.dataset
          AND r.mname = t.mname AND contains(r.cond, t.tf[i]))),
rules AS (
    SELECT *,
           regexp_extract(cond, '(\w+)\[', 1) AS rentity
    FROM (SELECT * FROM core_rules UNION ALL SELECT * FROM th_rules))
"""


# lineage deps (dax.py identify_dependencies — dax_parser.py:262-287):
# over ALL measures incl. standalone lang='dax' rows.
_ALL_MEASURES = r"""
dax_sa AS (
    SELECT repo, 'Standalone' AS dataset,
           coalesce(json_extract_string(content, '$.table'), '') AS tbl,
           coalesce(json_extract_string(content, '$.name'), '') AS mname,
           coalesce(json_extract_string(content, '$.expression'), '') AS expr
    FROM corpus WHERE lang = 'dax'),
all_msr AS (
    SELECT repo, dataset, tbl, mname, expr FROM msr
    UNION ALL
    SELECT repo, dataset, tbl, mname, expr FROM dax_sa),
dep_lists AS (
    SELECT repo, dataset, tbl, mname, expr,
           list_sort(list_distinct(list_concat(
               list_transform(range(1, len(ts) + 1),
                              i -> ts[i] || '.' || cs[i]),
               list_transform(
                   list_filter(
                       regexp_extract_all(expr, '\b([A-Z][a-zA-Z0-9_]*)\[', 1),
                       t -> upper(t) NOT IN
                            ('IF','CALCULATE','SUM','COUNT','AVG','MAX','MIN')),
                   t -> t || '.*')))) AS deps
    FROM (SELECT *,
                 regexp_extract_all(expr, '(\w+)\[(\w+)\]', 1) AS ts,
                 regexp_extract_all(expr, '(\w+)\[(\w+)\]', 2) AS cs
          FROM all_msr))
"""


def _measure_type(u: str, raw: str) -> str:
    """dax_parser.py:289-317 precedence chain (substring semantics)."""
    return f"""CASE
        WHEN {u} LIKE '%DATEADD%' OR {u} LIKE '%TOTALYTD%' OR {u} LIKE
             '%TOTALQTD%' OR {u} LIKE '%TOTALMTD%' OR {u} LIKE
             '%SAMEPERIODLASTYEAR%' THEN 'TIME_INTELLIGENCE'
        WHEN {u} LIKE '%IF%' OR {u} LIKE '%SWITCH%' THEN 'CONDITIONAL'
        WHEN {u} LIKE '%CALCULATE%' AND ({u} LIKE '%FILTER%' OR
             contains({raw}, '>') OR contains({raw}, '<')) THEN 'FILTER'
        WHEN {u} LIKE '%SUM%' OR {u} LIKE '%COUNT%' OR {u} LIKE '%AVG%' OR
             {u} LIKE '%AVERAGE%' OR {u} LIKE '%MAX%' OR {u} LIKE '%MIN%' OR
             {u} LIKE '%DISTINCTCOUNT%' THEN 'AGGREGATION'
        ELSE 'CALCULATION' END"""


# the 44-triple static OntoGuard catalog (owl.py:129-181) with the 3
# default roles — constants of the emission grammar
def _base_values() -> str:
    rows: list[tuple[str, str, str]] = [
        ("ont:User", "rdf:type", "owl:Class"),
        ("ont:User", "rdfs:label", "User"),
        ("ont:User", "rdfs:comment", "Base class for user roles"),
        ("ont:Action", "rdf:type", "owl:Class"),
        ("ont:Action", "rdfs:label", "Action"),
        ("ont:Action", "rdfs:comment", "Base class for actions"),
    ]
    for a in ["ReadAction", "WriteAction", "DeleteAction", "ExecuteAction"]:
        rows += [
            (f"ont:{a}", "rdf:type", "owl:Class"),
            (f"ont:{a}", "rdfs:subClassOf", "ont:Action"),
            (f"ont:{a}", "rdfs:label", a),
        ]
    rows += [
        ("ont:requiresRole", "rdf:type", "owl:ObjectProperty"),
        ("ont:requiresRole", "rdfs:label", "requiresRole"),
        ("ont:requiresRole", "rdfs:comment",
         "Role required to perform this action"),
        ("ont:requiresRole", "rdfs:domain", "ont:Action"),
        ("ont:requiresRole", "rdfs:range", "ont:User"),
        ("ont:appliesTo", "rdf:type", "owl:ObjectProperty"),
        ("ont:appliesTo", "rdfs:label", "appliesTo"),
        ("ont:appliesTo", "rdfs:comment", "Entity this action applies to"),
        ("ont:appliesTo", "rdfs:domain", "ont:Action"),
        ("ont:allowsAction", "rdf:type", "owl:DatatypeProperty"),
        ("ont:allowsAction", "rdfs:label", "allowsAction"),
        ("ont:allowsAction", "rdfs:comment", "Action type allowed"),
        ("ont:allowsAction", "rdfs:range", "xsd:string"),
        ("ont:appliesToProperty", "rdf:type", "owl:DatatypeProperty"),
        ("ont:appliesToProperty", "rdfs:label", "appliesToProperty"),
        ("ont:appliesToProperty", "rdfs:comment",
         "Property this action applies to"),
        ("ont:appliesToProperty", "rdfs:range", "xsd:string"),
    ]
    for role in ["Admin", "Analyst", "Viewer"]:
        rows += [
            (f"ont:{role}", "rdf:type", "owl:Class"),
            (f"ont:{role}", "rdfs:subClassOf", "ont:User"),
            (f"ont:{role}", "rdfs:label", role),
        ]
    return ",\n        ".join(
        "('{}', '{}', '{}')".format(*r) for r in rows
    )


_XSD = (
    "CASE otype WHEN 'String' THEN 'xsd:string' WHEN 'Integer' THEN "
    "'xsd:integer' WHEN 'Decimal' THEN 'xsd:decimal' WHEN 'Date' THEN "
    "'xsd:date' WHEN 'DateTime' THEN 'xsd:dateTime' WHEN 'Boolean' THEN "
    "'xsd:boolean' ELSE 'xsd:string' END"
)


def _triple_families(generated_at: str) -> str:
    """All triple families as (repo, dataset, subj, pred, obj) CTEs."""
    e_uri = "'ont:' || " + _safe("entity")
    p_uri = "'ont:' || " + _safe("entity") + " || '_' || " + _safe("pname")
    return rf"""
t_meta AS (  -- owl.py:114-127
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM model, UNNEST([
        {{'s': 'ont:' || {_safe('dataset')} || '_Ontology', 'p': 'rdf:type',
          'o': 'owl:Ontology'}},
        {{'s': 'ont:' || {_safe('dataset')} || '_Ontology', 'p': 'rdfs:label',
          'o': dataset || '_Ontology'}},
        {{'s': 'ont:' || {_safe('dataset')} || '_Ontology',
          'p': 'rdfs:comment', 'o': 'Ontology from Power BI: ' || path}},
        {{'s': 'ont:' || {_safe('dataset')} || '_Ontology',
          'p': 'owl:versionInfo', 'o': '1.0.0'}},
        {{'s': 'ont:' || {_safe('dataset')} || '_Ontology',
          'p': 'ont:meta_generation_date', 'o': '{generated_at}'}},
        {{'s': 'ont:' || {_safe('dataset')} || '_Ontology',
          'p': 'ont:meta_source_model', 'o': dataset}}]) AS _(u)),
t_base AS (  -- owl.py:129-181
    SELECT d.repo, d.dataset, b.subj, b.pred, b.obj
    FROM repo_ds d CROSS JOIN (VALUES
        {_base_values()}) AS b(subj, pred, obj)),
t_ent AS (  -- owl.py:183-199
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM ent2, UNNEST([
        {{'s': {e_uri}, 'p': 'rdf:type', 'o': 'owl:Class'}},
        {{'s': {e_uri}, 'p': 'rdfs:label', 'o': entity}},
        {{'s': {e_uri}, 'p': 'rdfs:comment', 'o': (CASE WHEN descr <> '' THEN descr END)}},
        {{'s': {e_uri}, 'p': 'ont:entityType', 'o': entity_type}},
        {{'s': {e_uri}, 'p': 'ont:sourceTable', 'o': entity}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_prop AS (  -- owl.py:210-242
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM prop, UNNEST([
        {{'s': {p_uri}, 'p': 'rdf:type', 'o': 'owl:DatatypeProperty'}},
        {{'s': {p_uri}, 'p': 'rdfs:label', 'o': pname}},
        {{'s': {p_uri}, 'p': 'rdfs:domain', 'o': {e_uri}}},
        {{'s': {p_uri}, 'p': 'rdfs:range', 'o': {_XSD}}},
        {{'s': {p_uri}, 'p': 'rdfs:comment', 'o': (CASE WHEN pdescr <> '' THEN pdescr END)}},
        {{'s': {p_uri}, 'p': 'ont:sourceColumn', 'o': (CASE WHEN pname <> '' THEN pname END)}},
        {{'s': {p_uri}, 'p': 'rdf:type',
          'o': CASE WHEN uniq THEN 'owl:FunctionalProperty' END}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_req AS (  -- owl.py:244-262 minCardinality restriction (injective bnode key)
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, '_:r#' || dataset || '|' || entity || '|' || pname AS bn
          FROM prop WHERE required), UNNEST([
        {{'s': bn, 'p': 'rdf:type', 'o': 'owl:Restriction'}},
        {{'s': bn, 'p': 'owl:onProperty', 'o': {p_uri}}},
        {{'s': bn, 'p': 'owl:minCardinality', 'o': '1'}},
        {{'s': {e_uri}, 'p': 'rdfs:subClassOf', 'o': bn}}]) AS _(u)),
t_rel AS (  -- owl.py:311-338
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, 'ont:' || {_safe("from_e || '_' || rel_type || '_' || to_e")}
                 AS rel_uri FROM rel2), UNNEST([
        {{'s': rel_uri, 'p': 'rdf:type', 'o': 'owl:ObjectProperty'}},
        {{'s': rel_uri, 'p': 'rdfs:label', 'o': rel_type}},
        {{'s': rel_uri, 'p': 'rdfs:domain', 'o': 'ont:' || {_safe('from_e')}}},
        {{'s': rel_uri, 'p': 'rdfs:range', 'o': 'ont:' || {_safe('to_e')}}},
        {{'s': rel_uri, 'p': 'rdfs:comment',
          'o': 'Relationship from ' || from_e || ' to ' || to_e}},
        {{'s': rel_uri, 'p': 'ont:sourceRelationship', 'o': (CASE WHEN src_rel <> '' THEN src_rel END)}},
        {{'s': rel_uri, 'p': 'ont:cardinality', 'o': card}},
        {{'s': rel_uri, 'p': 'ont:fromProperty', 'o': (CASE WHEN from_p <> '' THEN from_p END)}},
        {{'s': rel_uri, 'p': 'ont:toProperty', 'o': (CASE WHEN to_p <> '' THEN to_p END)}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_rule AS (  -- owl.py:340-384
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, 'ont:' || {_safe('rule_name')} || 'Rule' AS cls,
                 'ont:' || {_safe('rule_name')} || 'RuleInstance' AS inst
          FROM rules), UNNEST([
        {{'s': cls, 'p': 'rdf:type', 'o': 'owl:Class'}},
        {{'s': cls, 'p': 'rdfs:subClassOf', 'o': 'ont:Action'}},
        {{'s': cls, 'p': 'rdfs:label', 'o': rule_name}},
        {{'s': cls, 'p': 'rdfs:comment',
          'o': (CASE WHEN coalesce(nullif(rdescr, ''), mdescr) <> '' THEN coalesce(nullif(rdescr, ''), mdescr) END)}},
        {{'s': inst, 'p': 'rdf:type', 'o': cls}},
        {{'s': inst, 'p': 'ont:appliesTo',
          'o': CASE WHEN coalesce((CASE WHEN rentity <> '' THEN rentity END), tbl) <> ''
                    THEN 'ont:' || {_safe("coalesce((CASE WHEN rentity <> '' THEN rentity END), tbl)")}
               END}},
        {{'s': inst, 'p': 'ont:condition', 'o': (CASE WHEN {_sanitize('cond')} <> '' THEN {_sanitize('cond')} END)}},
        {{'s': inst, 'p': 'ont:ruleAction', 'o': (CASE WHEN action <> '' THEN action END)}},
        {{'s': inst, 'p': 'ont:classification', 'o': (CASE WHEN classification <> '' THEN classification END)}},
        {{'s': inst, 'p': 'ont:priority', 'o': '1'}},
        {{'s': inst, 'p': 'ont:sourceMeasure', 'o': (CASE WHEN mname <> '' THEN mname END)}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_crud AS (  -- owl.py:386-409
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT e.*, c.action, c.action_class, c.role,
                 'ont:' || c.action || '_' || {_safe('e.entity')} || '_' ||
                     c.role AS crud_uri
          FROM ent2 e CROSS JOIN (VALUES
              ('read', 'ont:ReadAction', 'Admin'),
              ('read', 'ont:ReadAction', 'Analyst'),
              ('read', 'ont:ReadAction', 'Viewer'),
              ('create', 'ont:WriteAction', 'Admin'),
              ('create', 'ont:WriteAction', 'Analyst'),
              ('create', 'ont:WriteAction', 'Viewer'),
              ('update', 'ont:WriteAction', 'Admin'),
              ('update', 'ont:WriteAction', 'Analyst'),
              ('update', 'ont:WriteAction', 'Viewer'),
              ('delete', 'ont:DeleteAction', 'Admin'),
              ('delete', 'ont:DeleteAction', 'Analyst'),
              ('delete', 'ont:DeleteAction', 'Viewer'))
              AS c(action, action_class, role)), UNNEST([
        {{'s': crud_uri, 'p': 'rdf:type', 'o': action_class}},
        {{'s': crud_uri, 'p': 'ont:appliesTo', 'o': {e_uri}}},
        {{'s': crud_uri, 'p': 'ont:requiresRole', 'o': 'ont:' || role}},
        {{'s': crud_uri, 'p': 'ont:allowsAction', 'o': action}}]) AS _(u)),
t_rls_prop AS (  -- owl.py:411-425 one daxFilter property per dataset
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM repo_ds, UNNEST([
        {{'s': 'ont:daxFilter', 'p': 'rdf:type', 'o': 'owl:DatatypeProperty'}},
        {{'s': 'ont:daxFilter', 'p': 'rdfs:label', 'o': 'daxFilter'}},
        {{'s': 'ont:daxFilter', 'p': 'rdfs:comment',
          'o': 'DAX filter expression for RLS'}}]) AS _(u)),
t_rls AS (  -- owl.py:427-455
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, 'ont:' || {_safe('role')} AS role_uri,
                 'ont:RLS_' || {_safe('role')} || '_' || {_safe('ptable')}
                     AS rls_uri
          FROM perm), UNNEST([
        {{'s': role_uri, 'p': 'rdf:type', 'o': 'owl:Class'}},
        {{'s': role_uri, 'p': 'rdfs:subClassOf', 'o': 'ont:User'}},
        {{'s': role_uri, 'p': 'rdfs:label', 'o': role}},
        {{'s': rls_uri, 'p': 'rdf:type', 'o': 'ont:ReadAction'}},
        {{'s': rls_uri, 'p': 'rdfs:label',
          'o': 'RLS: ' || role || ' on ' || ptable}},
        {{'s': rls_uri, 'p': 'ont:appliesTo', 'o': 'ont:' || {_safe('ptable')}}},
        {{'s': rls_uri, 'p': 'ont:requiresRole', 'o': role_uri}},
        {{'s': rls_uri, 'p': 'ont:daxFilter',
          'o': (CASE WHEN {_sanitize('pfilter')} <> '' THEN {_sanitize('pfilter')} END)}},
        {{'s': rls_uri, 'p': 'rdfs:comment',
          'o': 'RLS rule for ' || ptable || ' in role ' || role}},
        {{'s': rls_uri, 'p': 'ont:isRLSRule', 'o': 'true'}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_lin_head AS (  -- lineage heads (north-star surface; dax_parser.py:289-317)
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, 'ont:measure_' || {_safe('mname')} AS m_uri,
                 upper(expr) AS uex FROM all_msr), UNNEST([
        {{'s': m_uri, 'p': 'rdf:type', 'o': 'ont:Measure'}},
        {{'s': m_uri, 'p': 'ont:measureType',
          'o': {_measure_type('uex', 'expr')}}},
        {{'s': m_uri, 'p': 'ont:inTable', 'o': 'ont:' || {_safe('tbl')}}}])
        AS _(u)),
t_lin_dep AS (  -- dependency edges (dax_parser.py:262-287)
    SELECT repo, dataset,
           'ont:measure_' || {_safe('mname')} AS subj,
           'ont:dependsOn' AS pred,
           CASE WHEN dep LIKE '%.*'
                THEN 'ont:' || {_safe('substr(dep, 1, len(dep) - 2)')}
                ELSE 'ont:' || {_safe('dep')} END AS obj
    FROM (SELECT repo, dataset, mname, unnest(deps) AS dep FROM dep_lists)),
t_pc AS (  -- T7 property constraints (owl.py:264-299): suggested
    -- enhancements (ontology_generator.py:314-366) over model properties
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, lower(pname) AS pl,
                 otype IN ('Integer', 'Decimal') AS is_num FROM prop),
         UNNEST([
        {{'s': {p_uri}, 'p': 'ont:pattern',
          'o': CASE WHEN pl LIKE '%email%' AND otype = 'String'
                    THEN '^[^\\s@]+@[^\\s@]+\\.[^\\s@]+$' END}},
        {{'s': {p_uri}, 'p': 'ont:pattern',
          'o': CASE WHEN pl LIKE '%url%' OR pl LIKE '%website%'
                    THEN '^https?://' END}},
        {{'s': {p_uri}, 'p': 'ont:minValue',
          'o': CASE WHEN is_num AND pl LIKE '%age%' THEN '0'
                    WHEN is_num AND pl NOT LIKE '%age%' AND
                         (pl LIKE '%score%' OR pl LIKE '%rating%') THEN '0'
               END}},
        {{'s': {p_uri}, 'p': 'ont:maxValue',
          'o': CASE WHEN is_num AND pl LIKE '%age%' THEN '150'
                    WHEN is_num AND pl NOT LIKE '%age%' AND
                         (pl LIKE '%score%' OR pl LIKE '%rating%') THEN '100'
               END}}]) AS _(u)
    WHERE u.o IS NOT NULL),
side AS (  -- ontology-JSON sidecars (constraint load path)
    SELECT repo, coalesce(d.dataset, 'Unknown') AS dataset,
           unnest(coalesce(d.entities, [])) AS e
    FROM (SELECT repo, json_transform(content::JSON, '{_SIDECAR_STRUCT}') AS d
          FROM corpus WHERE lang = 'ontology_json')),
side_pc AS (
    SELECT repo, dataset, entity, coalesce(c.type, '') AS ctype,
           c.pattern AS cpattern, c.min AS cmin, c.max AS cmax,
           c."values" AS cvals, c.target AS ctarget, c.message AS cmsg,
           pname
    FROM (SELECT repo, dataset, coalesce(e.name, 'Unknown') AS entity,
                 coalesce(p.name, '') AS pname,
                 unnest(coalesce(p.constraints, [])) AS c
          FROM (SELECT repo, dataset, e,
                       unnest(coalesce(e.properties, [])) AS p
                FROM side))),
t_side_flat AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM side_pc, UNNEST([
        {{'s': {p_uri.replace("pname", "pname")}, 'p': 'ont:minValue',
          'o': CASE WHEN ctype = 'range' AND cmin IS NOT NULL THEN
               CASE WHEN cmin = floor(cmin)
                    THEN CAST(CAST(cmin AS BIGINT) AS VARCHAR)
                    ELSE CAST(cmin AS VARCHAR) END END}},
        {{'s': {p_uri}, 'p': 'ont:maxValue',
          'o': CASE WHEN ctype = 'range' AND cmax IS NOT NULL THEN
               CASE WHEN cmax = floor(cmax)
                    THEN CAST(CAST(cmax AS BIGINT) AS VARCHAR)
                    ELSE CAST(cmax AS VARCHAR) END END}},
        {{'s': {p_uri}, 'p': 'ont:pattern',
          'o': CASE WHEN ctype = 'regex' THEN (CASE WHEN cpattern <> '' THEN cpattern END) END}},
        {{'s': {p_uri}, 'p': 'ont:references',
          'o': CASE WHEN ctype = 'reference' THEN (CASE WHEN ctarget <> '' THEN ctarget END) END}},
        {{'s': {p_uri}, 'p': 'ont:constraintMessage',
          'o': (CASE WHEN cmsg <> '' THEN cmsg END)}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_side_enum AS (  -- owl.py:289-293 indexed enum predicates
    SELECT repo, dataset, {p_uri} AS subj,
           'ont:enumValue_' || CAST(i - 1 AS VARCHAR) AS pred,
           cvals[i] AS obj
    FROM side_pc, unnest(range(1, len(cvals) + 1)) AS _(i)
    WHERE ctype = 'enum' AND cvals IS NOT NULL),
side_ec AS (
    SELECT repo, dataset, coalesce(e.name, 'Unknown') AS entity,
           coalesce(c.type, '') AS ctype, coalesce(c.value, '') AS cval,
           coalesce(c.message, '') AS cmsg,
           '_:ec#' || dataset || '|' || coalesce(e.name, 'Unknown') || '|' ||
               coalesce(c.type, '') || '|' || coalesce(c.value, '') AS bn
    FROM (SELECT repo, dataset, e, unnest(coalesce(e.constraints, [])) AS c
          FROM side)),
t_ec AS (  -- T8 entity constraints (owl.py:301-309)
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM side_ec, UNNEST([
        {{'s': bn, 'p': 'rdf:type', 'o': 'ont:EntityConstraint'}},
        {{'s': bn, 'p': 'ont:constraintType', 'o': (CASE WHEN ctype <> '' THEN ctype END)}},
        {{'s': bn, 'p': 'ont:constraintValue', 'o': (CASE WHEN cval <> '' THEN cval END)}},
        {{'s': bn, 'p': 'rdfs:comment', 'o': (CASE WHEN cmsg <> '' THEN cmsg END)}},
        {{'s': 'ont:' || {_safe('entity')}, 'p': 'ont:hasConstraint',
          'o': bn}}]) AS _(u)
    WHERE u.o IS NOT NULL),
mconn AS (  -- M connection grammar (functions/mquery.py:46-74)
    SELECT c.repo, coalesce(d.dataset, 'Unknown') AS dataset,
           regexp_extract(content, 'in\s+(\w+)\s*$', 1) AS qname,
           regexp_extract(content, '=\s*((?:\w+\.)+\w+)\s*\(', 1) AS connector,
           CASE WHEN regexp_extract(content,
                    '=\s*(?:\w+\.)+\w+\s*\(\s*"([^"]*)"', 1) <> ''
                THEN regexp_extract(content,
                    '=\s*(?:\w+\.)+\w+\s*\(\s*"([^"]*)"', 1)
                ELSE regexp_extract(content,
                    '=\s*(?:\w+\.)+\w+\s*\(\s*(?:\w+\.)+\w+\s*\(\s*"([^"]*)"',
                    1) END AS host,
           regexp_extract(content,
               '=\s*(?:\w+\.)+\w+\s*\(\s*"[^"]*"\s*,\s*"([^"]*)"', 1) AS db,
           regexp_extract(content, 'Schema\s*=\s*"([^"]+)"', 1) AS sch,
           regexp_extract(content, 'Item\s*=\s*"([^"]+)"', 1) AS item
    FROM corpus c LEFT JOIN repo_ds d USING (repo)
    WHERE lang = 'm'),
t_m AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *,
                 'ont:datasource_' || {_safe('host')} || '_' || {_safe('db')}
                     || '_' || {_safe('sch')} || '_' || {_safe('item')} AS ds_uri,
                 'ont:mquery_' || {_safe('qname')} AS q_uri
          FROM mconn WHERE connector <> '' AND host <> ''), UNNEST([
        {{'s': q_uri, 'p': 'rdf:type', 'o': 'ont:PowerQuery'}},
        {{'s': q_uri, 'p': 'ont:connectsTo', 'o': ds_uri}},
        {{'s': ds_uri, 'p': 'rdf:type', 'o': 'ont:DataSource'}},
        {{'s': ds_uri, 'p': 'ont:connector', 'o': (CASE WHEN connector <> '' THEN connector END)}},
        {{'s': ds_uri, 'p': 'ont:host', 'o': (CASE WHEN host <> '' THEN host END)}},
        {{'s': ds_uri, 'p': 'ont:database', 'o': (CASE WHEN db <> '' THEN db END)}},
        {{'s': ds_uri, 'p': 'ont:schema', 'o': (CASE WHEN sch <> '' THEN sch END)}},
        {{'s': ds_uri, 'p': 'ont:item', 'o': (CASE WHEN item <> '' THEN item END)}},
        {{'s': ds_uri, 'p': 'ont:connectionString',
          'o': host || '/' || db || '.' || sch || '.' || item}}]) AS _(u)
    WHERE u.o IS NOT NULL),
layout AS (  -- report layout (functions/layout.py): two-level JSON
    SELECT c.repo, c.path, coalesce(d.dataset, 'Unknown') AS dataset,
           json_transform(c.content::JSON,
               '{{"sections":[{{"name":"VARCHAR",'
               '"visualContainers":[{{"config":"VARCHAR"}}]}}]}}') AS l
    FROM corpus c LEFT JOIN repo_ds d USING (repo)
    WHERE lang = 'report_json'),
vis AS (
    SELECT repo, path, dataset, page, i - 1 AS visual_idx,
           json_extract_string(vcs[i].config, '$.singleVisual.visualType')
               AS vtype,
           json_extract(vcs[i].config, '$.singleVisual.projections') AS proj
    FROM (SELECT repo, path, dataset, coalesce(s.name, '') AS page,
                 coalesce(s.visualContainers, []) AS vcs
          FROM (SELECT repo, path, dataset,
                       unnest(coalesce(l.sections, [])) AS s
                FROM layout)),
         unnest(range(1, len(vcs) + 1)) AS _(i)),
binding AS (
    SELECT v.repo, v.path, v.dataset, v.page, v.visual_idx,
           json_extract_string(
               json_extract(v.proj, '$.' || k || '[' ||
                   CAST(j - 1 AS VARCHAR) || '].queryRef'), '$') AS qref
    FROM (SELECT *, unnest(json_keys(proj)) AS k FROM vis) v,
         unnest(range(1, CAST(json_array_length(
             json_extract(v.proj, '$.' || v.k)) AS BIGINT) + 1)) AS _(j)),
t_rep AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT DISTINCT repo, path, dataset,
                 'ont:report_' || {_safe('path')} AS rep_uri FROM vis),
         UNNEST([
        {{'s': rep_uri, 'p': 'rdf:type', 'o': 'ont:Report'}},
        {{'s': rep_uri, 'p': 'ont:usesDataset',
          'o': 'ont:' || {_safe('dataset')}}}]) AS _(u)),
t_vis AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *,
                 'ont:visual_' || {_safe('path')} || '_' || {_safe('page')} ||
                     '_' || CAST(visual_idx AS VARCHAR) AS v_uri,
                 'ont:report_' || {_safe('path')} AS rep_uri
          FROM vis), UNNEST([
        {{'s': v_uri, 'p': 'rdf:type', 'o': 'ont:Visual'}},
        {{'s': v_uri, 'p': 'ont:visualType', 'o': vtype}},
        {{'s': v_uri, 'p': 'ont:onPage', 'o': page}},
        {{'s': v_uri, 'p': 'ont:inReport', 'o': rep_uri}}]) AS _(u)
    WHERE u.o IS NOT NULL),
t_bind AS (
    SELECT repo, dataset,
           'ont:visual_' || {_safe('path')} || '_' || {_safe('page')} || '_'
               || CAST(visual_idx AS VARCHAR) AS subj,
           'ont:bindsField' AS pred,
           'ont:' || {_safe('qref')} AS obj
    FROM binding WHERE qref IS NOT NULL),
triples AS (  -- rdflib Graph set semantics = DISTINCT over the union
    SELECT DISTINCT repo, dataset, subj, pred, obj FROM (
        SELECT * FROM t_meta UNION ALL SELECT * FROM t_base
        UNION ALL SELECT * FROM t_ent UNION ALL SELECT * FROM t_prop
        UNION ALL SELECT * FROM t_req UNION ALL SELECT * FROM t_rel
        UNION ALL SELECT * FROM t_rule UNION ALL SELECT * FROM t_crud
        UNION ALL SELECT * FROM t_rls_prop UNION ALL SELECT * FROM t_rls
        UNION ALL SELECT * FROM t_lin_head UNION ALL SELECT * FROM t_lin_dep
        UNION ALL SELECT * FROM t_pc UNION ALL SELECT * FROM t_side_flat
        UNION ALL SELECT * FROM t_side_enum UNION ALL SELECT * FROM t_ec
        UNION ALL SELECT * FROM t_m UNION ALL SELECT * FROM t_rep
        UNION ALL SELECT * FROM t_vis UNION ALL SELECT * FROM t_bind))
"""


def triples_by_pred_sql(
    corpus_path: str, generated_at: str = "1970-01-01T00:00:00"
) -> str:
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _ALL_MEASURES
        + ","
        + _triple_families(generated_at)
        + """
SELECT pred, CAST(count(*) AS BIGINT) AS n
FROM triples GROUP BY pred ORDER BY pred"""
    )


# The emission grammar's object-valued (non-literal) predicates —
# every other pred carries a literal object.  This map is FUNCTIONAL
# (no pred is emitted with both literal and URI objects);
# tests/test_triples.py::test_object_preds_match_oracle_constant pins
# the engine frame to this list, so the graph-census oracle may derive
# obj_is_literal from pred alone.
OBJECT_PREDS = (
    "ont:appliesTo",
    "ont:bindsField",
    "ont:connectsTo",
    "ont:dependsOn",
    "ont:hasConstraint",
    "ont:inReport",
    "ont:inTable",
    "ont:requiresRole",
    "ont:usesDataset",
    "owl:onProperty",
    "rdf:type",
    "rdfs:domain",
    "rdfs:range",
    "rdfs:subClassOf",
)


def graph_tables_sql(
    corpus_path: str, generated_at: str = "1970-01-01T00:00:00"
) -> str:
    """V1 graph materialization census (pipeline.nodes_edges): nodes =
    distinct subjects ∪ URI objects per (repo, dataset), typed by the
    min rdf:type object; edges = URI→URI triples.  Object-ness is
    derived from OBJECT_PREDS (see above)."""
    objs = ",".join(f"'{p}'" for p in OBJECT_PREDS)
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _ALL_MEASURES
        + ","
        + _triple_families(generated_at)
        + f""",
nodes0 AS (
    SELECT DISTINCT repo, dataset, subj AS node FROM triples
    UNION
    SELECT DISTINCT repo, dataset, obj AS node FROM triples
    WHERE pred IN ({objs})),
ntypes AS (
    SELECT repo, dataset, subj AS node, min(obj) AS node_type
    FROM triples WHERE pred = 'rdf:type' GROUP BY 1, 2, 3),
nodes AS (
    SELECT n.repo, n.dataset, n.node, t.node_type
    FROM nodes0 n LEFT JOIN ntypes t USING (repo, dataset, node))
SELECT * FROM (
    SELECT 'node' AS kind, coalesce(node_type, '') AS key,
           CAST(count(*) AS BIGINT) AS n
    FROM nodes GROUP BY 2
    UNION ALL
    SELECT 'edge' AS kind, pred AS key, CAST(count(*) AS BIGINT) AS n
    FROM triples WHERE pred IN ({objs}) GROUP BY 2)
ORDER BY kind, key"""
    )


def _mermaid_id(expr: str) -> str:
    """DuckDB twin of report_lines._mermaid_id: strip 'ont:' then
    rewrite :-./ and space to '_' (reports.mermaid_diagram.nid)."""
    out = f"replace({expr}, 'ont:', '')"
    for ch in ":-./ ":
        out = f"replace({out}, '{ch}', '_')"
    return out


def mermaid_lines_sql(
    corpus_path: str,
    repo: str,
    max_nodes: int = 60,
    generated_at: str = "1970-01-01T00:00:00",
) -> str:
    """V2 mermaid diagram body (reports.mermaid_diagram / engine
    functions/report_lines.mermaid_lines) for one repo's graph: node
    declarations for the first `max_nodes` nodes by name plus the edges
    between kept nodes.  Node/edge identity is the graph_tables_sql
    census grammar (subjects ∪ OBJECT_PREDS objects, min-rdf:type)."""
    objs = ",".join(f"'{p}'" for p in OBJECT_PREDS)
    nid_n = _mermaid_id("node")
    nid_s = _mermaid_id("subj")
    nid_o = _mermaid_id("obj")
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _ALL_MEASURES
        + ","
        + _triple_families(generated_at)
        + f""",
g AS (SELECT * FROM triples WHERE repo = '{repo}'),
-- named nodes only: bnode identity is engine-internal (hashed there,
-- concat-keyed here) and excluded from the cross-engine surface
nodes0 AS (
    SELECT DISTINCT dataset, subj AS node FROM g
    WHERE NOT starts_with(subj, '_:')
    UNION
    SELECT DISTINCT dataset, obj AS node FROM g
    WHERE pred IN ({objs}) AND NOT starts_with(obj, '_:')),
ntypes AS (
    SELECT dataset, subj AS node, min(obj) AS node_type
    FROM g WHERE pred = 'rdf:type' GROUP BY 1, 2),
-- node identity for a diagram is the NAME: per-dataset rows collapse
-- to the min non-null type, and rendered lines are DISTINCT (mirrors
-- report_lines.mermaid_lines)
keep AS (
    SELECT node, min(node_type) AS node_type
    FROM (SELECT n.dataset, n.node, t.node_type
          FROM nodes0 n LEFT JOIN ntypes t USING (dataset, node))
    GROUP BY node
    ORDER BY node LIMIT {max_nodes})
SELECT DISTINCT * FROM (
    SELECT 'node' AS kind,
           '    ' || {nid_n} ||
           CASE WHEN node_type = 'owl:Class'
                THEN '[("' || replace(node, 'ont:', '') || '")]'
                ELSE '["' || replace(node, 'ont:', '') || '"]'
           END AS line
    FROM keep
    UNION ALL
    SELECT 'edge' AS kind,
           '    ' || {nid_s} || ' -->|' ||
           replace(replace(pred, 'ont:', ''), 'rdfs:', '') || '| ' ||
           {nid_o} AS line
    FROM g
    WHERE pred IN ({objs})
      AND subj IN (SELECT node FROM keep)
      AND obj IN (SELECT node FROM keep))
ORDER BY kind, line"""
    )


def relevant_rules_sql(corpus_path: str) -> str:
    """C3-C4 relevant-rule selection (contract_builder.py:219-230):
    rules whose entity is in the agent read set, the read set restricted
    to non-fact entities (same restriction as the entry query)."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _ALL_MEASURES
        + """,
perm_src AS (
    SELECT repo, dataset, entity FROM ent2
    UNION ALL
    SELECT repo, dataset, from_e AS entity FROM rel2
    UNION ALL
    SELECT repo, dataset, to_e AS entity FROM rel2
    UNION ALL
    SELECT repo, dataset, string_split(dep, '.')[1] AS entity
    FROM (SELECT repo, dataset, unnest(deps) AS dep
          FROM dep_lists WHERE dataset <> 'Standalone')
    WHERE contains(dep, '.')),
restricted AS (
    SELECT DISTINCT p.repo, p.dataset, p.entity
    FROM perm_src p JOIN ent2 e
      ON p.repo = e.repo AND p.dataset = e.dataset AND p.entity = e.entity
    WHERE e.entity_type <> 'fact')
SELECT r.repo AS repo, r.dataset AS dataset,
       coalesce(nullif(r.rentity, ''), r.tbl) AS entity,
       r.rule_name AS name, r.action AS action
FROM rules r
WHERE EXISTS (
    SELECT 1 FROM restricted s
    WHERE s.repo = r.repo AND s.dataset = r.dataset
      AND s.entity = coalesce(nullif(r.rentity, ''), r.tbl))
ORDER BY repo, dataset, entity, name, action"""
    )


def rule_conflict_groups_sql(corpus_path: str) -> str:
    """A6/A10 grouping surface (semantic_debt.py:462-504): rule names
    with >1 distinct condition, with sorted distinct source and
    condition sets.  The SequenceMatcher severity probe has no SQL
    analogue and is pytest-pinned instead."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + """
SELECT rule_name AS name,
       array_to_string(list_sort(list_distinct(list(
           repo || '/' || dataset))), '|') AS sources,
       array_to_string(list_sort(list_distinct(list(cond))), '|')
           AS conditions,
       CAST(count(DISTINCT cond) AS BIGINT) AS n_conditions
FROM rules GROUP BY rule_name
HAVING count(DISTINCT cond) > 1
ORDER BY name"""
    )


def drift_fixes_sql(corpus_path: str) -> str:
    """M3+M4: drift rows → fix suggestions (schema_mapper.py:162-302)
    over the same three-mutation catalog as the entry query.  The
    rename heuristic is the reference's containment / common-char check
    (schema_mapper.py:353-369), re-implemented in SQL; rename pairing
    claims each side once via the same double row_number the engine
    uses."""
    snake = _SNAKE.format(e="pname")
    sim = """
        (x <> '' AND y <> '' AND (contains(y, x) OR contains(x, y) OR
         (abs(len(x) - len(y)) <= 3 AND
          len(list_filter(range(1, len(x) + 1), i -> contains(y, x[i])))
              > 0.7 * greatest(len(x), len(y)))))"""
    return (
        "WITH "
        + _prelude(corpus_path)
        + f""",
bind AS (
    SELECT repo, dataset, entity, {snake} AS physical_column,
           otype AS expected_type
    FROM prop),
act AS (
    SELECT repo, dataset, entity,
           CASE WHEN physical_column = 'vibration' THEN 'vibration_level'
                ELSE physical_column END AS "column",
           CASE WHEN physical_column = 'temperature' THEN 'String'
                ELSE expected_type END AS col_type
    FROM bind WHERE physical_column <> 'risk_score'
    UNION ALL
    SELECT DISTINCT repo, dataset, 'Shipment', 'ingest_ts', 'String'
    FROM bind),
exp AS (
    -- deterministic type per column under snake_case collisions: the
    -- engine's detect_drift groups to min(expected_type) the same way
    -- (a DISTINCT over (..., expected_type) would yield extra
    -- type_change rows whenever two properties share a column)
    SELECT repo, dataset, entity, physical_column AS "column",
           min(expected_type) AS expected_type
    FROM bind GROUP BY repo, dataset, entity, physical_column),
missing AS (
    SELECT e.* FROM exp e
    WHERE NOT EXISTS (
        SELECT 1 FROM act a
        WHERE a.repo = e.repo AND a.dataset = e.dataset
          AND a.entity = e.entity AND a."column" = e."column")),
new_cols AS (
    SELECT a.* FROM act a
    WHERE NOT EXISTS (
        SELECT 1 FROM exp e
        WHERE e.repo = a.repo AND e.dataset = a.dataset
          AND e.entity = a.entity AND e."column" = a."column")),
cand AS (
    SELECT m.repo, m.dataset, m.entity,
           m."column" AS missing_col, n."column" AS new_col
    FROM missing m JOIN new_cols n
      ON m.repo = n.repo AND m.dataset = n.dataset AND m.entity = n.entity
    WHERE (SELECT {sim} FROM (SELECT
               replace(replace(lower(m."column"), '_', ''), '-', '') AS x,
               replace(replace(lower(n."column"), '_', ''), '-', '') AS y))),
renamed AS (
    SELECT repo, dataset, entity, missing_col, new_col FROM (
        SELECT *, row_number() OVER (
            PARTITION BY repo, dataset, entity, new_col
            ORDER BY missing_col) AS r2
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY repo, dataset, entity, missing_col
                  ORDER BY new_col) AS r1
              FROM cand)
        WHERE r1 = 1)
    WHERE r2 = 1),
drift AS (
    SELECT m.repo, m.dataset, m.entity,
           'missing_column' AS drift_type, m."column" AS "column",
           NULL AS new_column, NULL AS old_type, NULL AS new_type
    FROM missing m
    WHERE NOT EXISTS (
        SELECT 1 FROM renamed r
        WHERE r.repo = m.repo AND r.dataset = m.dataset
          AND r.entity = m.entity AND r.missing_col = m."column")
    UNION ALL
    SELECT repo, dataset, entity, 'renamed_column', missing_col,
           new_col, NULL, NULL
    FROM renamed
    UNION ALL
    SELECT e.repo, e.dataset, e.entity, 'type_change', e."column",
           NULL, e.expected_type, a.col_type
    FROM exp e JOIN act a
      ON a.repo = e.repo AND a.dataset = e.dataset
     AND a.entity = e.entity AND a."column" = e."column"
    WHERE e.expected_type <> a.col_type
    UNION ALL
    SELECT n.repo, n.dataset, n.entity, 'new_column', n."column",
           NULL, NULL, n.col_type
    FROM new_cols n
    WHERE NOT EXISTS (
        SELECT 1 FROM renamed r
        WHERE r.repo = n.repo AND r.dataset = n.dataset
          AND r.entity = n.entity AND r.new_col = n."column"))
SELECT repo, dataset, entity,
       CASE WHEN drift_type = 'new_column' THEN 'add_column'
            ELSE 'update_mapping' END AS fix_type,
       "column" AS property,
       CASE drift_type
            WHEN 'renamed_column' THEN
                'Update mapping: ' || "column" || ' -> ' || new_column
            WHEN 'missing_column' THEN
                'Column ''' || "column" ||
                ''' not found. Check if renamed or deleted.'
            WHEN 'new_column' THEN
                'New column ''' || "column" ||
                ''' found. Consider adding to ontology.'
            ELSE 'Type changed for ''' || "column" || ''': ' ||
                 old_type || ' -> ' || new_type
       END AS description
FROM drift
ORDER BY repo, dataset, entity, fix_type, property, description"""
    )


def export_summary_sql(
    corpus_path: str, generated_at: str = "1970-01-01T00:00:00"
) -> str:
    """T13 export census (owl.py:513-548): per (repo, dataset) —
    total triples, distinct owl:Class / owl:DatatypeProperty /
    owl:ObjectProperty subjects, and rdf:type rows into the four
    Action classes — recomputed over the full triple-family union."""
    actions = "('ont:ReadAction','ont:WriteAction','ont:DeleteAction','ont:ExecuteAction')"
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _ALL_MEASURES
        + ","
        + _triple_families(generated_at)
        + f"""
SELECT repo, dataset,
       CAST(count(*) AS BIGINT) AS total_triples,
       CAST(count(DISTINCT CASE WHEN pred = 'rdf:type'
            AND obj = 'owl:Class' THEN subj END) AS BIGINT) AS classes,
       CAST(count(DISTINCT CASE WHEN pred = 'rdf:type'
            AND obj = 'owl:DatatypeProperty' THEN subj END) AS BIGINT)
           AS datatype_properties,
       CAST(count(DISTINCT CASE WHEN pred = 'rdf:type'
            AND obj = 'owl:ObjectProperty' THEN subj END) AS BIGINT)
           AS object_properties,
       CAST(count(CASE WHEN pred = 'rdf:type'
            AND obj IN {actions} THEN 1 END) AS BIGINT) AS action_rules
FROM triples GROUP BY repo, dataset ORDER BY repo, dataset"""
    )


def contract_triples_sql(corpus_path: str) -> str:
    """T15 contract→OWL emission (export/contract_to_owl.py:69-111):
    5 ReadAction triples per granted entity of the C1-C2 read set
    (default agent='agent', role='Viewer', permission='read')."""
    safe_e = _safe("entity")
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _ALL_MEASURES
        + f""",
perm_src AS (
    SELECT repo, dataset, entity FROM ent2
    UNION ALL
    SELECT repo, dataset, from_e AS entity FROM rel2
    UNION ALL
    SELECT repo, dataset, to_e AS entity FROM rel2
    UNION ALL
    SELECT repo, dataset, string_split(dep, '.')[1] AS entity
    FROM (SELECT repo, dataset, unnest(deps) AS dep
          FROM dep_lists WHERE dataset <> 'Standalone')
    WHERE contains(dep, '.')),
rs AS (SELECT DISTINCT repo, dataset, entity FROM perm_src)
SELECT repo, dataset,
       'ont:contract_agent_read_' || {safe_e} AS subj,
       u.p AS pred, u.o AS obj, u.l AS obj_is_literal
FROM rs, UNNEST([
    {{'p': 'rdf:type', 'o': 'ont:ReadAction', 'l': FALSE}},
    {{'p': 'ont:appliesTo', 'o': 'ont:' || {safe_e}, 'l': FALSE}},
    {{'p': 'ont:requiresRole', 'o': 'ont:Viewer', 'l': FALSE}},
    {{'p': 'ont:allowsAction', 'o': 'read', 'l': TRUE}},
    {{'p': 'ont:grantedBy', 'o': 'agent', 'l': TRUE}}]) AS _(u)
ORDER BY repo, dataset, subj, pred, obj"""
    )


def lineage_edges_sql(corpus_path: str) -> str:
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _ALL_MEASURES
        + f"""
SELECT DISTINCT repo, dataset,
       'ont:measure_' || {_safe('mname')} AS subj,
       CASE WHEN dep LIKE '%.*'
            THEN 'ont:' || {_safe('substr(dep, 1, len(dep) - 2)')}
            ELSE 'ont:' || {_safe('dep')} END AS obj
FROM (SELECT repo, dataset, mname, unnest(deps) AS dep FROM dep_lists)
ORDER BY repo, dataset, subj, obj"""
    )


# measure-conflict pair CTEs (analyzer.py:79-121 + :319-335 severity) —
# shared by measure_conflicts_sql and semantic_debt_sql
_CONFLICTS_CTE = r"""
mc AS (
    SELECT lower(mname) AS concept, mname AS name,
           repo || '/' || dataset AS src, expr AS formula
    FROM msr),
mc_ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY concept ORDER BY src, name) AS rnk
    FROM mc),
conflicts AS (
    SELECT a.concept AS concept, a.src AS dashboard1, b.src AS dashboard2,
           a.formula AS definition1, b.formula AS definition2,
           '''' || a.concept || ''' defined differently in ' || a.src ||
               ' vs ' || b.src AS description,
           CASE WHEN lower(a.formula) = lower(b.formula) THEN 'LOW'
                WHEN contains(a.formula, '>') AND contains(b.formula, '>')
                     AND regexp_extract(a.formula, '[><=]+\s*(\d+)', 1) <> ''
                     AND regexp_extract(b.formula, '[><=]+\s*(\d+)', 1) <> ''
                     AND abs(CAST(regexp_extract(a.formula, '[><=]+\s*(\d+)', 1)
                                  AS BIGINT)
                             - CAST(regexp_extract(b.formula, '[><=]+\s*(\d+)', 1)
                                    AS BIGINT)) > 20 THEN 'HIGH'
                ELSE 'MEDIUM' END AS severity
    FROM mc_ranked a JOIN mc_ranked b
      ON a.concept = b.concept AND a.rnk < b.rnk
    WHERE a.formula <> b.formula)
"""

# duplicate-logic groups (analyzer.py:154-200), shared likewise.
# measure_name/description mirror analytics.duplicate_logic: sorted
# name exemplars, first = min; the same-name/different-name branches.
_DUP_CTE = r"""
dupg AS (
    SELECT CASE WHEN count(DISTINCT name) = 1 THEN min(name)
                ELSE min(name) || ' (and ' ||
                     CAST(count(*) - 1 AS VARCHAR) || ' others)' END
               AS measure_name,
           CAST(count(*) AS BIGINT) AS n_dashboards,
           list_sort(list(src)) AS dashboards,
           min(formula) AS dax_formula,
           CASE WHEN count(DISTINCT name) = 1
                THEN 'Same measure ''' || min(name) || ''' duplicated across '
                     || CAST(count(*) AS VARCHAR) || ' dashboards'
                ELSE 'Same logic with different names: ' ||
                     array_to_string(list_sort(list(name)), ', ') END
               AS description
    FROM (SELECT mname AS name, repo || '/' || dataset AS src,
                 expr AS formula,
                 lower(regexp_replace(expr, '\s+', '', 'g')) AS norm
          FROM msr) m
    GROUP BY norm HAVING count(*) > 1)
"""


def measure_conflicts_sql(corpus_path: str) -> str:
    """analyzer.py:79-121 pair semantics + :319-335 severity."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _CONFLICTS_CTE
        + """
SELECT concept, dashboard1, dashboard2, severity
FROM conflicts
ORDER BY concept, dashboard1, dashboard2"""
    )


def duplicate_logic_sql(corpus_path: str) -> str:
    """analyzer.py:154-200: group by whitespace-stripped lowercase
    formula; the fixture's duplicate groups are single-name, so
    min(name) ≡ the engine's names[1]."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _DUP_CTE
        + """
SELECT measure_name, n_dashboards FROM dupg ORDER BY measure_name"""
    )


def entity_conflicts_sql(corpus_path: str) -> str:
    """A2 (analyzer.py:123-150): same entity name (ci), different
    {property→type} maps, pairwise across dashboards; the map compare
    is an order-insensitive sorted-struct-list equality."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + """,
ec AS (
    SELECT lower(entity) AS concept, repo || '/' || dataset AS src,
           list(struct_pack(property := pname, data_type := otype)
                ORDER BY pname, otype) AS props,
           count(*) AS n_props
    FROM prop GROUP BY 1, 2)
SELECT a.concept AS concept,
       a.src AS dashboard1,
       CAST(a.n_props AS VARCHAR) || ' properties' AS definition1,
       b.src AS dashboard2,
       CAST(b.n_props AS VARCHAR) || ' properties' AS definition2,
       'MEDIUM' AS severity,
       'Entity ''' || a.concept ||
           ''' has different properties across dashboards' AS description
FROM ec a JOIN ec b ON a.concept = b.concept AND a.src < b.src
WHERE a.props <> b.props
ORDER BY concept, dashboard1, dashboard2"""
    )


def semantic_debt_sql(corpus_path: str) -> str:
    """A4 (analyzer.py:202-238): $50K × conflicts + $10K × duplications
    with the by-severity census, from the SAME conflict/dup grammars as
    the kg_measure_conflicts / kg_duplicate_logic oracles."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _CONFLICTS_CTE
        + ","
        + _DUP_CTE
        + """
SELECT CAST((SELECT count(*) FROM conflicts) AS BIGINT) AS total_conflicts,
       CAST((SELECT count(*) FROM dupg) AS BIGINT) AS total_duplications,
       CAST((SELECT count(*) FROM conflicts) * 50000.0
            + (SELECT count(*) FROM dupg) * 10000.0 AS DOUBLE) AS total_cost,
       coalesce((SELECT string_agg(severity || ':' || CAST(n AS VARCHAR),
                                   ',' ORDER BY severity)
                 FROM (SELECT severity, count(*) AS n
                       FROM conflicts GROUP BY severity)), '')
           AS by_severity"""
    )


# canonical-definition CTEs (analyzer.py:240-295) — shared by
# canonical_definitions_sql and debt_report_lines_sql
_CANON_CTE = r"""
cdm AS (
    SELECT lower(mname) AS name, repo || '/' || dataset AS src,
           lower(regexp_replace(expr, '\s+', '', 'g')) AS norm
    FROM msr),
cd_counts AS (
    SELECT name, norm, count(*) AS cnt, list_sort(list(src)) AS srcs
    FROM cdm GROUP BY name, norm),
cd_tot AS (
    SELECT name, sum(cnt) AS total FROM cd_counts
    GROUP BY name HAVING sum(cnt) > 1),
cd_rank AS (
    SELECT c.*, t.total,
           row_number() OVER (PARTITION BY c.name
                              ORDER BY c.cnt DESC, c.norm) AS rk
    FROM cd_counts c JOIN cd_tot t USING (name))
"""


def canonical_definitions_sql(corpus_path: str) -> str:
    """A5 (analyzer.py:240-295): per multiply-defined measure name, the
    mode of the whitespace-stripped lowercase formula is the suggested
    canonical; confidence = mode_count / total.  Tie-break = (count
    DESC, normalized formula ASC), same as the engine's window."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _CANON_CTE
        + r""",
cd_alt AS (
    SELECT name, flatten(list(srcs)) AS alts
    FROM cd_rank WHERE rk > 1 GROUP BY name)
SELECT r.name AS name,
       r.norm AS suggested_definition,
       ROUND(CAST(r.cnt AS DOUBLE) / r.total, 6) AS confidence,
       array_to_string(r.srcs, '|') AS dashboards_using,
       coalesce(array_to_string(list_sort(a.alts), '|'), '')
           AS alternative_sources
FROM cd_rank r LEFT JOIN cd_alt a USING (name)
WHERE r.rk = 1
ORDER BY name"""
    )


#: shared A7-A9 family CTEs (used by debt_conflicts_sql and
#: recommendations_sql — change in lockstep with analytics.py)
_DEBT_FAMS = """
props_by AS (
    SELECT entity AS name, repo || '/' || dataset AS src,
           list_sort(list_distinct(list(pname))) AS props
    FROM prop GROUP BY 1, 2),
ec_pairs AS (
    SELECT a.name AS name, a.src AS src1, b.src AS src2,
           list_sort(list_filter(a.props,
               x -> NOT list_contains(b.props, x))) AS only1,
           list_sort(list_filter(b.props,
               x -> NOT list_contains(a.props, x))) AS only2,
           len(list_intersect(a.props, b.props)) AS n_common,
           len(list_distinct(list_concat(a.props, b.props))) AS n_total
    FROM props_by a JOIN props_by b
      ON a.name = b.name AND a.src < b.src),
fam_entity AS (
    SELECT 'entity_conflict' AS conflict_type,
           CASE WHEN n_total = 0 THEN 'INFO'
                WHEN CAST(n_common AS DOUBLE) / n_total < 0.5 THEN 'CRITICAL'
                WHEN CAST(n_common AS DOUBLE) / n_total < 0.8 THEN 'WARNING'
                ELSE 'INFO' END AS severity,
           name, src1 || '|' || src2 AS sources,
           'only1=' || array_to_string(only1, ',') ||
               ';only2=' || array_to_string(only2, ',') AS detail,
           ROUND(CAST(n_common AS DOUBLE) / n_total, 6) AS overlap_ratio
    FROM ec_pairs WHERE len(only1) > 0 OR len(only2) > 0),
fam_type AS (
    SELECT 'type_conflict' AS conflict_type, 'CRITICAL' AS severity,
           entity || '.' || pname AS name,
           array_to_string(list_sort(list_distinct(list(
               repo || '/' || dataset))), '|') AS sources,
           'types=' || array_to_string(
               list_sort(list_distinct(list(otype))), ',') AS detail,
           -1.0 AS overlap_ratio
    FROM prop GROUP BY entity, pname
    HAVING count(DISTINCT otype) > 1),
fam_rel AS (
    SELECT 'relationship_conflict' AS conflict_type, 'WARNING' AS severity,
           from_e || ' → ' || to_e AS name,
           array_to_string(list_sort(list_distinct(list(
               repo || '/' || dataset))), '|') AS sources,
           'cards=' || array_to_string(
               list_sort(list_distinct(list(card))), ',') AS detail,
           -1.0 AS overlap_ratio
    FROM rel GROUP BY from_e, to_e
    HAVING count(DISTINCT card) > 1)
"""


def debt_conflicts_sql(corpus_path: str) -> str:
    """A7-A9 (semantic_debt.py:334-460): entity property-set conflicts
    (severity by overlap ratio: <0.5 CRITICAL, <0.8 WARNING, else
    INFO), property-type conflicts (always CRITICAL), and
    relationship-cardinality conflicts (WARNING), on the common
    (conflict_type, severity, name, sources, detail, overlap_ratio)
    schema; overlap_ratio is -1.0 for the non-entity families."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _DEBT_FAMS
        + """
SELECT * FROM (
    SELECT * FROM fam_entity
    UNION ALL SELECT * FROM fam_type
    UNION ALL SELECT * FROM fam_rel)
ORDER BY conflict_type, name, sources"""
    )


def recommendations_sql(corpus_path: str) -> str:
    """A12 (semantic_debt.py:532-568 / reports.py
    recommendations_from_conflicts): rule-based report tips fired from
    the A7-A9 conflict census (the SQL-expressible debt families;
    A10-severity rule conflicts stay pytest-covered, so the
    'Centralize business rules' tip is exercised by the driver-twin
    parity test, not this oracle)."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _DEBT_FAMS
        + """,
conflicts AS (
    SELECT conflict_type, severity FROM fam_entity
    UNION ALL SELECT conflict_type, severity FROM fam_type
    UNION ALL SELECT conflict_type, severity FROM fam_rel),
agg AS (
    SELECT count(*) AS total,
           count(*) FILTER (WHERE severity = 'CRITICAL') AS crit,
           count(*) FILTER (WHERE severity = 'WARNING') AS warn,
           max(CASE WHEN conflict_type = 'type_conflict'
                    THEN 1 ELSE 0 END) AS has_type,
           max(CASE WHEN conflict_type = 'entity_conflict'
                    THEN 1 ELSE 0 END) AS has_entity,
           max(CASE WHEN conflict_type = 'rule_conflict'
                    THEN 1 ELSE 0 END) AS has_rule
    FROM conflicts)
SELECT tip FROM (
    SELECT 'No semantic conflicts detected. Good job!' AS tip
    FROM agg WHERE total = 0
    UNION ALL
    SELECT 'Address ' || CAST(crit AS VARCHAR) ||
           ' critical conflict(s) immediately - they may cause data inconsistencies.'
    FROM agg WHERE crit > 0
    UNION ALL
    SELECT 'Create a shared data dictionary to standardize property types across dashboards.'
    FROM agg WHERE has_type = 1
    UNION ALL
    SELECT 'Consider creating a master ontology schema that all dashboards inherit from.'
    FROM agg WHERE has_entity = 1
    UNION ALL
    SELECT 'Centralize business rules in a single repository to ensure consistency.'
    FROM agg WHERE has_rule = 1
    UNION ALL
    SELECT 'Schedule a semantic alignment review with stakeholders from different dashboard teams.'
    FROM agg WHERE warn > 3)
ORDER BY tip"""
    )


def debt_report_lines_sql(corpus_path: str) -> str:
    """V2/A1/A3/A5 (analyzer.py:343-420 report layout): the three
    per-item body sections of the HTML semantic-debt report — conflict
    divs, duplication divs and canonical-suggestion table rows — built
    from the SAME conflict/duplication/canonical grammars the
    kg_measure_conflicts / kg_duplicate_logic / kg_canonical_definitions
    oracles grade.  The `{confidence:.0%}` cell renders via
    printf('%.0f') (HALF_EVEN on exact doubles, matching Python format
    and Spark format_number)."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _CONFLICTS_CTE
        + ","
        + _DUP_CTE
        + ","
        + _CANON_CTE
        + r"""
SELECT section, line FROM (
    SELECT 'conflict' AS section,
           e'\n    <div class="conflict">\n        <h3>' || concept ||
           e'</h3>\n        <p><strong>Severity:</strong> ' || severity ||
           e'</p>\n        <p><strong>' || dashboard1 || ':</strong> ' ||
           definition1 ||
           e'</p>\n        <p><strong>' || dashboard2 || ':</strong> ' ||
           definition2 ||
           e'</p>\n        <p>' || description || e'</p>\n    </div>'
               AS line
    FROM conflicts
    UNION ALL
    SELECT 'duplication',
           e'\n    <div class="duplication">\n        <h3>' ||
           measure_name ||
           e'</h3>\n        <p><strong>Dashboards:</strong> ' ||
           array_to_string(dashboards, ', ') ||
           e'</p>\n        <p><strong>Formula:</strong> <code>' ||
           dax_formula ||
           e'</code></p>\n        <p>' || description ||
           e'</p>\n    </div>'
    FROM dupg
    UNION ALL
    SELECT 'canonical',
           e'\n        <tr>\n            <td>' || name ||
           e'</td>\n            <td><code>' || substr(norm, 1, 100) ||
           e'...</code></td>\n            <td>' ||
           printf('%.0f', CAST(cnt AS DOUBLE) / total * 100) ||
           e'%</td>\n            <td>' || CAST(len(srcs) AS VARCHAR) ||
           e'</td>\n        </tr>'
    FROM cd_rank WHERE rk = 1)
ORDER BY section, line"""
    )


def canonical_clusters_sql(corpus_path: str) -> str:
    """EXACT all-pairs entity linking (name heuristic of
    schema_mapper.py:353-369 + property-set Jaccard ≥ 0.5) + transitive
    closure — an independent brute-force oracle for the engine's
    MinHash-LSH + large-star/small-star approximation.  Agreement here
    is a recall proof for the LSH blocking at this corpus scale."""
    name_sim = """
        (x.sname = y.sname OR contains(y.sname, x.sname) OR
         contains(x.sname, y.sname) OR
         (abs(len(x.sname) - len(y.sname)) <= 3 AND
          len(list_filter(range(1, len(x.sname) + 1),
              i -> contains(y.sname, x.sname[i]))) >
              0.7 * greatest(len(x.sname), len(y.sname))))"""
    return (
        "WITH RECURSIVE "
        + _prelude(corpus_path)
        + f""",
nodes AS (
    SELECT e.repo || '||' || e.dataset || '||' || e.entity AS id,
           replace(replace(lower(e.entity), '_', ''), '-', '') AS sname,
           coalesce(p.props, []) AS props
    FROM ent2 e LEFT JOIN (
        SELECT repo, dataset, entity,
               list_sort(list_distinct(list(pname))) AS props
        FROM prop GROUP BY repo, dataset, entity) p
      ON e.repo = p.repo AND e.dataset = p.dataset AND e.entity = p.entity),
edges AS (
    SELECT x.id AS u, y.id AS v
    FROM nodes x JOIN nodes y ON x.id < y.id
    WHERE x.sname <> '' AND y.sname <> '' AND {name_sim}
      AND (CASE WHEN len(list_distinct(list_concat(x.props, y.props))) = 0
                THEN 1.0
                ELSE CAST(len(list_intersect(x.props, y.props)) AS DOUBLE) /
                     len(list_distinct(list_concat(x.props, y.props))) END)
          >= 0.5),
edges_sym AS (
    SELECT u, v FROM edges UNION SELECT v, u FROM edges),
reach(a, b) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT r.a, e.v FROM reach r JOIN edges_sym e ON e.u = r.b),
comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
sizes AS (
    SELECT component, CAST(count(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component)
SELECT n_members, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY n_members ORDER BY n_members"""
    )


def _fabric_static_values() -> str:
    """fabric_iq_to_owl.py:126-201 — base classes (5 roles), action
    classes, OntoGuard properties (incl. requiresApproval): 53 triples."""
    rows = [
        ("ont:User", "rdf:type", "owl:Class"),
        ("ont:User", "rdfs:label", "User"),
        ("ont:User", "rdfs:comment", "Base class for all user roles"),
    ]
    for role in ["Admin", "Analyst", "Viewer", "Editor", "Owner"]:
        rows += [
            (f"ont:{role}", "rdf:type", "owl:Class"),
            (f"ont:{role}", "rdfs:subClassOf", "ont:User"),
            (f"ont:{role}", "rdfs:label", role),
        ]
    rows += [
        ("ont:Action", "rdf:type", "owl:Class"),
        ("ont:Action", "rdfs:label", "Action"),
        ("ont:Action", "rdfs:comment",
         "Base class for all actions that can be performed"),
    ]
    for a in ["ReadAction", "WriteAction", "DeleteAction", "ExecuteAction"]:
        rows += [
            (f"ont:{a}", "rdf:type", "owl:Class"),
            (f"ont:{a}", "rdfs:subClassOf", "ont:Action"),
            (f"ont:{a}", "rdfs:label", a),
        ]
    rows += [
        ("ont:requiresRole", "rdf:type", "owl:ObjectProperty"),
        ("ont:requiresRole", "rdfs:label", "requires role"),
        ("ont:requiresRole", "rdfs:comment",
         "Specifies which user role is required to perform an action"),
        ("ont:requiresRole", "rdfs:domain", "ont:Action"),
        ("ont:requiresRole", "rdfs:range", "ont:User"),
        ("ont:appliesTo", "rdf:type", "owl:ObjectProperty"),
        ("ont:appliesTo", "rdfs:label", "applies to"),
        ("ont:appliesTo", "rdfs:comment",
         "Specifies which entity type an action can be applied to"),
        ("ont:appliesTo", "rdfs:domain", "ont:Action"),
        ("ont:appliesTo", "rdfs:range", "owl:Thing"),
        ("ont:requiresApproval", "rdf:type", "owl:ObjectProperty"),
        ("ont:requiresApproval", "rdfs:label", "requires approval"),
        ("ont:requiresApproval", "rdfs:comment",
         "Indicates that an action requires approval from a specific role"),
        ("ont:requiresApproval", "rdfs:domain", "ont:Action"),
        ("ont:requiresApproval", "rdfs:range", "ont:User"),
        ("ont:allowsAction", "rdf:type", "owl:DatatypeProperty"),
        ("ont:allowsAction", "rdfs:label", "allows action"),
        ("ont:allowsAction", "rdfs:comment",
         "Specifies the action type: read, create, update, delete"),
        ("ont:allowsAction", "rdfs:domain", "ont:Action"),
        ("ont:allowsAction", "rdfs:range", "xsd:string"),
    ]
    return ",\n        ".join("('{}', '{}', '{}')".format(*r) for r in rows)


def _safe_uri(expr: str) -> str:
    """fabric_iq_to_owl.py:407-413 — translate then strip non-word."""
    return (
        f"regexp_replace(translate({expr}, ' -.', '___'), "
        "'[^A-Za-z0-9_]', '', 'g')"
    )


def fabric_owl_by_pred_sql(
    corpus_path: str,
    extracted_date: str = "1970-01-01T00:00:00",
    version: str = "1.0.0",
    source: str = "Power BI",
) -> str:
    """Independent recomputation of the Fabric IQ → OWL triple census
    (fabric_iq_to_owl.py:67-405 grammar over the same corpus)."""
    su = _safe_uri
    e_uri = "'ont:' || " + su("entity")
    p_uri = "'ont:' || " + su("entity || '_' || pname")
    fxsd = (
        "CASE lower(otype) WHEN 'string' THEN 'xsd:string' "
        "WHEN 'integer' THEN 'xsd:integer' WHEN 'int' THEN 'xsd:integer' "
        "WHEN 'decimal' THEN 'xsd:decimal' WHEN 'float' THEN 'xsd:decimal' "
        "WHEN 'double' THEN 'xsd:double' WHEN 'date' THEN 'xsd:date' "
        "WHEN 'datetime' THEN 'xsd:dateTime' WHEN 'boolean' THEN "
        "'xsd:boolean' WHEN 'bool' THEN 'xsd:boolean' ELSE 'xsd:string' END"
    )
    snake = (
        "lower(regexp_replace(regexp_replace(entity, '(.)([A-Z][a-z]+)', "
        r"'\1_\2', 'g'), '([a-z0-9])([A-Z])', '\1_\2', 'g'))"
    )
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + f""",
f_meta AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM repo_ds, UNNEST([
        {{'s': 'ont:' || {su(f"dataset || '_v{version}'")}, 'p': 'rdf:type',
          'o': 'owl:Ontology'}},
        {{'s': 'ont:' || {su(f"dataset || '_v{version}'")}, 'p': 'rdfs:label',
          'o': dataset || '_v{version}'}},
        {{'s': 'ont:' || {su(f"dataset || '_v{version}'")},
          'p': 'rdfs:comment', 'o': 'Ontology extracted from {source}'}},
        {{'s': 'ont:' || {su(f"dataset || '_v{version}'")},
          'p': 'owl:versionInfo', 'o': '{version}'}},
        {{'s': 'ont:' || {su(f"dataset || '_v{version}'")},
          'p': 'ont:extractedDate', 'o': '{extracted_date}'}}]) AS _(u)),
f_base AS (
    SELECT d.repo, d.dataset, b.subj, b.pred, b.obj
    FROM repo_ds d CROSS JOIN (VALUES
        {_fabric_static_values()}) AS b(subj, pred, obj)),
f_ent AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM ent2, UNNEST([
        {{'s': {e_uri}, 'p': 'rdf:type', 'o': 'owl:Class'}},
        {{'s': {e_uri}, 'p': 'rdfs:label', 'o': entity}},
        {{'s': {e_uri}, 'p': 'rdfs:comment',
          'o': CASE WHEN descr <> '' THEN descr END}},
        {{'s': {e_uri}, 'p': 'ont:entityType',
          'o': CASE WHEN entity_type <> '' THEN entity_type END}},
        {{'s': {e_uri}, 'p': 'ont:sourceTable', 'o': entity}}]) AS _(u)
    WHERE u.o IS NOT NULL),
f_prop AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM prop, UNNEST([
        {{'s': {p_uri}, 'p': 'rdf:type', 'o': 'owl:DatatypeProperty'}},
        {{'s': {p_uri}, 'p': 'rdfs:label', 'o': pname}},
        {{'s': {p_uri}, 'p': 'rdfs:domain', 'o': {e_uri}}},
        {{'s': {p_uri}, 'p': 'rdfs:range', 'o': {fxsd}}},
        {{'s': {p_uri}, 'p': 'rdfs:comment',
          'o': CASE WHEN pdescr <> '' THEN pdescr END}}]) AS _(u)
    WHERE u.o IS NOT NULL),
f_crud AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT e.*, c.action, c.action_class, c.role,
                 'ont:' || {su("c.action || '_' || e.entity")} AS act
          FROM ent2 e CROSS JOIN (VALUES
              ('read', 'ont:ReadAction', 'Viewer'),
              ('create', 'ont:WriteAction', 'Editor'),
              ('update', 'ont:WriteAction', 'Editor'),
              ('delete', 'ont:DeleteAction', 'Admin'))
              AS c(action, action_class, role)), UNNEST([
        {{'s': act, 'p': 'rdf:type', 'o': action_class}},
        {{'s': act, 'p': 'rdfs:label', 'o': action || ' ' || entity}},
        {{'s': act, 'p': 'ont:allowsAction', 'o': action}},
        {{'s': act, 'p': 'ont:appliesTo', 'o': {e_uri}}},
        {{'s': act, 'p': 'ont:requiresRole', 'o': 'ont:' || role}}]) AS _(u)),
f_rel AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *, 'ont:' ||
                 {su("from_e || '_' || rel_type || '_' || to_e")} AS rel_uri
          FROM rel2 WHERE from_e <> '' AND to_e <> ''), UNNEST([
        {{'s': rel_uri, 'p': 'rdf:type', 'o': 'owl:ObjectProperty'}},
        {{'s': rel_uri, 'p': 'rdfs:label', 'o': rel_type}},
        {{'s': rel_uri, 'p': 'rdfs:domain', 'o': 'ont:' || {su('from_e')}}},
        {{'s': rel_uri, 'p': 'rdfs:range', 'o': 'ont:' || {su('to_e')}}},
        {{'s': rel_uri, 'p': 'rdfs:comment',
          'o': 'Relationship from ' || from_e || ' to ' || to_e}},
        {{'s': rel_uri, 'p': 'ont:cardinality',
          'o': CASE WHEN card <> '' THEN card END}}]) AS _(u)
    WHERE u.o IS NOT NULL),
f_rules AS (
    SELECT repo, dataset, u.s AS subj, u.p AS pred, u.o AS obj
    FROM (SELECT *,
                 'ont:' || {su('rule_name')} || 'Action' AS cls,
                 'ont:' || {su('rule_name')} || 'ActionInstance' AS inst,
                 coalesce(CASE WHEN rentity <> '' THEN rentity END, tbl)
                     AS r_ent,
                 -- P15 triggers (fabric_iq.py:234-243): NotifyOperations
                 -- overrides the classification→role mapping (:336-356)
                 CASE WHEN lower(action) LIKE '%notify%' OR lower(action)
                          LIKE '%alert%' THEN 'Admin'
                      WHEN lower(classification) IN ('critical', 'high')
                          THEN 'Admin'
                      WHEN lower(classification) = 'medium' THEN 'Editor'
                      WHEN lower(classification) = 'low' THEN 'Viewer'
                      WHEN lower(classification) = 'notify' THEN 'Analyst'
                      ELSE 'Viewer' END AS req_role
          FROM rules WHERE rule_name <> ''), UNNEST([
        {{'s': cls, 'p': 'rdf:type', 'o': 'owl:Class'}},
        {{'s': cls, 'p': 'rdfs:subClassOf', 'o': 'ont:Action'}},
        {{'s': cls, 'p': 'rdfs:label', 'o': rule_name}},
        {{'s': cls, 'p': 'rdfs:comment',
          'o': CASE WHEN coalesce(CASE WHEN rdescr <> '' THEN rdescr END,
                         mdescr) <> '' THEN
                   coalesce(CASE WHEN rdescr <> '' THEN rdescr END, mdescr)
               END}},
        {{'s': inst, 'p': 'rdf:type', 'o': cls}},
        {{'s': inst, 'p': 'rdfs:label', 'o': rule_name || ' action'}},
        {{'s': inst, 'p': 'ont:allowsAction',
          'o': CASE WHEN action <> '' THEN lower(action) END}},
        {{'s': inst, 'p': 'ont:appliesTo',
          'o': CASE WHEN r_ent <> '' THEN 'ont:' || {su('r_ent')} END}},
        {{'s': inst, 'p': 'ont:requiresRole', 'o': 'ont:' || req_role}},
        {{'s': inst, 'p': 'ont:ruleCondition',
          'o': CASE WHEN cond <> '' THEN cond END}}]) AS _(u)
    WHERE u.o IS NOT NULL),
f_bind AS (
    SELECT repo, dataset, {e_uri} AS subj, 'ont:schemaSource' AS pred,
           'sql_db.dbo.' || {snake} AS obj
    FROM ent2
    UNION ALL
    SELECT repo, dataset, {p_uri} AS subj, 'ont:sourceColumn' AS pred,
           pname AS obj
    FROM prop),
f_triples AS (
    SELECT DISTINCT repo, dataset, subj, pred, obj FROM (
        SELECT * FROM f_meta UNION ALL SELECT * FROM f_base
        UNION ALL SELECT * FROM f_ent UNION ALL SELECT * FROM f_prop
        UNION ALL SELECT * FROM f_crud UNION ALL SELECT * FROM f_rel
        UNION ALL SELECT * FROM f_rules UNION ALL SELECT * FROM f_bind))
SELECT pred, CAST(count(*) AS BIGINT) AS n
FROM f_triples GROUP BY pred ORDER BY pred"""
    )


_SNAKE = (
    "lower(regexp_replace(regexp_replace({e}, '(.)([A-Z][a-z]+)', "
    r"'\1_\2', 'g'), '([a-z0-9])([A-Z])', '\1_\2', 'g'))"
)


def _diff_block(tag: str, src: str, tgt: str) -> str:
    """CTE block recomputing the engine's diff_ontologies(src→tgt) as
    full-outer joins over the prelude families — the reference's Change
    record grammar (ontology_diff.py:240-534): entity add/remove +
    entity_type/description mods; property add/remove + data_type/
    required/unique mods within common entities; relationship add/
    remove + type/cardinality mods keyed on from→to; rule add/remove +
    condition/action/classification mods keyed on name.  Requires the
    prelude + _RULES CTEs.  Emits ``ch_{tag}``."""
    t = tag
    s_req = "CASE WHEN sr THEN 'True' ELSE 'False' END"
    t_req = "CASE WHEN tr THEN 'True' ELSE 'False' END"
    s_unq = "CASE WHEN su THEN 'True' ELSE 'False' END"
    t_unq = "CASE WHEN tu THEN 'True' ELSE 'False' END"
    return f"""
{t}_ent_s AS (SELECT entity, entity_type, descr, n_props FROM ent2
              WHERE repo = '{src}'),
{t}_ent_t AS (SELECT entity, entity_type, descr, n_props FROM ent2
              WHERE repo = '{tgt}'),
{t}_ent_j AS (
    SELECT s.entity AS se, t.entity AS te,
           s.entity_type AS sty, t.entity_type AS tty,
           s.descr AS sd, t.descr AS td,
           s.n_props AS snp, t.n_props AS tnp
    FROM {t}_ent_s s FULL OUTER JOIN {t}_ent_t t ON s.entity = t.entity),
{t}_common AS (SELECT se AS entity FROM {t}_ent_j
               WHERE se IS NOT NULL AND te IS NOT NULL),
{t}_pr_s AS (SELECT p.entity, p.pname, p.otype, p.required, p.uniq, p.pdescr
             FROM prop p JOIN {t}_common c ON p.entity = c.entity
             WHERE p.repo = '{src}'),
{t}_pr_t AS (SELECT p.entity, p.pname, p.otype, p.required, p.uniq, p.pdescr
             FROM prop p JOIN {t}_common c ON p.entity = c.entity
             WHERE p.repo = '{tgt}'),
{t}_pr_j AS (
    SELECT coalesce(s.entity, t.entity) AS entity,
           coalesce(s.pname, t.pname) AS pname,
           s.pname AS sp, t.pname AS tp,
           s.otype AS sty, t.otype AS tty,
           s.required AS sr, t.required AS tr,
           s.uniq AS su, t.uniq AS tu,
           s.pdescr AS sd, t.pdescr AS td
    FROM {t}_pr_s s FULL OUTER JOIN {t}_pr_t t
      ON s.entity = t.entity AND s.pname = t.pname),
{t}_rl_s AS (SELECT from_e || '→' || to_e AS rel_key, rel_type, card,
                    'Relationship from ' || from_e || ' to ' || to_e AS rdesc
             FROM rel2 WHERE repo = '{src}'),
{t}_rl_t AS (SELECT from_e || '→' || to_e AS rel_key, rel_type, card,
                    'Relationship from ' || from_e || ' to ' || to_e AS rdesc
             FROM rel2 WHERE repo = '{tgt}'),
{t}_rl_j AS (
    SELECT coalesce(s.rel_key, t.rel_key) AS rel_key,
           s.rel_key AS sk, t.rel_key AS tk,
           s.rel_type AS sty, t.rel_type AS tty,
           s.card AS sc, t.card AS tc,
           s.rdesc AS sd, t.rdesc AS td
    FROM {t}_rl_s s FULL OUTER JOIN {t}_rl_t t ON s.rel_key = t.rel_key),
{t}_ru_s AS (SELECT rule_name, cond, action, classification,
                    coalesce(nullif(rdescr, ''), mdescr) AS rdesc
             FROM rules WHERE repo = '{src}'),
{t}_ru_t AS (SELECT rule_name, cond, action, classification,
                    coalesce(nullif(rdescr, ''), mdescr) AS rdesc
             FROM rules WHERE repo = '{tgt}'),
{t}_ru_j AS (
    SELECT coalesce(s.rule_name, t.rule_name) AS name,
           s.rule_name AS sn, t.rule_name AS tn,
           s.cond AS sc, t.cond AS tc,
           s.action AS sa, t.action AS ta,
           s.classification AS scl, t.classification AS tcl,
           s.rdesc AS sd, t.rdesc AS td
    FROM {t}_ru_s s FULL OUTER JOIN {t}_ru_t t
      ON s.rule_name = t.rule_name),
ch_{t} AS (
    SELECT 'added' AS change_type, 'entity' AS element_type,
           te AS element_name, te AS path, '' AS old_value,
           'type=' || tty || ', properties=' || CAST(tnp AS VARCHAR)
               AS new_value,
           coalesce(td, '') AS details
    FROM {t}_ent_j WHERE se IS NULL
    UNION ALL
    SELECT 'removed', 'entity', se, se,
           'type=' || sty || ', properties=' || CAST(snp AS VARCHAR),
           '', coalesce(sd, '')
    FROM {t}_ent_j WHERE te IS NULL
    UNION ALL
    SELECT 'modified', 'entity', se, se || '.entity_type', sty, tty,
           'Entity type changed'
    FROM {t}_ent_j
    WHERE se IS NOT NULL AND te IS NOT NULL AND sty IS DISTINCT FROM tty
    UNION ALL
    SELECT 'modified', 'entity', se, se || '.description', sd, td,
           'Description updated'
    FROM {t}_ent_j
    WHERE se IS NOT NULL AND te IS NOT NULL AND sd IS DISTINCT FROM td
    UNION ALL
    SELECT 'added', 'property', tp, entity || '.' || pname, '',
           'type=' || tty || ', required=' || {t_req}, coalesce(td, '')
    FROM {t}_pr_j WHERE sp IS NULL
    UNION ALL
    SELECT 'removed', 'property', sp, entity || '.' || pname,
           'type=' || sty || ', required=' || {s_req}, '', coalesce(sd, '')
    FROM {t}_pr_j WHERE tp IS NULL
    UNION ALL
    SELECT 'modified', 'property', pname,
           entity || '.' || pname || '.data_type', sty, tty,
           'Data type changed'
    FROM {t}_pr_j
    WHERE sp IS NOT NULL AND tp IS NOT NULL AND sty IS DISTINCT FROM tty
    UNION ALL
    SELECT 'modified', 'property', pname,
           entity || '.' || pname || '.required', {s_req}, {t_req},
           'Required flag changed'
    FROM {t}_pr_j
    WHERE sp IS NOT NULL AND tp IS NOT NULL AND sr IS DISTINCT FROM tr
    UNION ALL
    SELECT 'modified', 'property', pname,
           entity || '.' || pname || '.unique', {s_unq}, {t_unq},
           'Unique flag changed'
    FROM {t}_pr_j
    WHERE sp IS NOT NULL AND tp IS NOT NULL AND su IS DISTINCT FROM tu
    UNION ALL
    SELECT 'added', 'relationship', tk, tk, '',
           'type=' || tty || ', cardinality=' || tc, coalesce(td, '')
    FROM {t}_rl_j WHERE sk IS NULL
    UNION ALL
    SELECT 'removed', 'relationship', sk, sk,
           'type=' || sty || ', cardinality=' || sc, '', coalesce(sd, '')
    FROM {t}_rl_j WHERE tk IS NULL
    UNION ALL
    SELECT 'modified', 'relationship', rel_key, rel_key || '.type',
           sty, tty, 'Relationship type changed'
    FROM {t}_rl_j
    WHERE sk IS NOT NULL AND tk IS NOT NULL AND sty IS DISTINCT FROM tty
    UNION ALL
    SELECT 'modified', 'relationship', rel_key, rel_key || '.cardinality',
           sc, tc, 'Cardinality changed'
    FROM {t}_rl_j
    WHERE sk IS NOT NULL AND tk IS NOT NULL AND sc IS DISTINCT FROM tc
    UNION ALL
    SELECT 'added', 'rule', tn, 'rule:' || name, '',
           'condition=' || tc || ', action=' || ta, coalesce(td, '')
    FROM {t}_ru_j WHERE sn IS NULL
    UNION ALL
    SELECT 'removed', 'rule', sn, 'rule:' || name,
           'condition=' || sc || ', action=' || sa, '', coalesce(sd, '')
    FROM {t}_ru_j WHERE tn IS NULL
    UNION ALL
    SELECT 'modified', 'rule', name, 'rule:' || name || '.condition',
           sc, tc, 'Condition changed'
    FROM {t}_ru_j
    WHERE sn IS NOT NULL AND tn IS NOT NULL AND sc IS DISTINCT FROM tc
    UNION ALL
    SELECT 'modified', 'rule', name, 'rule:' || name || '.action',
           sa, ta, 'Action changed'
    FROM {t}_ru_j
    WHERE sn IS NOT NULL AND tn IS NOT NULL AND sa IS DISTINCT FROM ta
    UNION ALL
    SELECT 'modified', 'rule', name,
           'rule:' || name || '.classification', scl, tcl,
           'Classification changed'
    FROM {t}_ru_j
    WHERE sn IS NOT NULL AND tn IS NOT NULL AND scl IS DISTINCT FROM tcl)
"""


def diff_changes_sql(corpus_path: str, src: str, tgt: str) -> str:
    """Full ontology diff src→tgt (engine: operators/diff.py
    diff_ontologies with keys=()), ordered on every column."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _diff_block("d", src, tgt)
        + """
SELECT change_type, element_type, element_name, path,
       coalesce(old_value, '') AS old_value,
       coalesce(new_value, '') AS new_value,
       details
FROM ch_d
ORDER BY change_type, element_type, element_name, path,
         old_value, new_value, details"""
    )


def changelog_lines_sql(corpus_path: str, src: str, tgt: str) -> str:
    """F7 changelog body (reports.changelog_markdown bullet grammar /
    engine functions/report_lines.changelog_lines): one markdown bullet
    per change row of the src→tgt diff, null values rendered empty."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _diff_block("d", src, tgt)
        + """
SELECT upper(substr(change_type, 1, 1)) || substr(change_type, 2)
           AS section,
       path,
       CASE WHEN change_type = 'modified'
            THEN '- `' || path || '`: ' || coalesce(old_value, '')
                 || ' → ' || coalesce(new_value, '') || det
            ELSE '- `' || path || '` (' || element_type || '): '
                 || coalesce(nullif(new_value, ''),
                             nullif(old_value, ''), '') || det
       END AS line
FROM (SELECT *,
             CASE WHEN coalesce(details, '') <> ''
                  THEN ' — ' || details ELSE '' END AS det
      FROM ch_d)
ORDER BY section, path, line"""
    )


def diff_summary_sql(corpus_path: str, src: str, tgt: str) -> str:
    """F6 cube summary (ontology_diff.py:84-97) over the same diff."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _diff_block("d", src, tgt)
        + """
SELECT coalesce(change_type, '(all)') AS change_type,
       coalesce(element_type, '(all)') AS element_type,
       CAST(count(*) AS BIGINT) AS n
FROM ch_d
GROUP BY CUBE (change_type, element_type)
ORDER BY change_type, element_type"""
    )


def diff_all_pairs_summary_sql(corpus_path: str, repos: list[str]) -> str:
    """All-pairs diff census: one _diff_block per (src < tgt) repo pair
    — the brute-force per-pair oracle for the engine's single-job
    join-fan-out diff_all_pairs operator."""
    import itertools

    pairs = list(itertools.combinations(sorted(repos), 2))
    blocks = ",".join(
        _diff_block(f"p{i}", src, tgt) for i, (src, tgt) in enumerate(pairs)
    )
    selects = "\n    UNION ALL ".join(
        f"SELECT '{src}' AS src_repo, '{tgt}' AS tgt_repo, "
        f"change_type, element_type FROM ch_p{i}"
        for i, (src, tgt) in enumerate(pairs)
    )
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + blocks
        + f"""
SELECT src_repo, tgt_repo, change_type, element_type,
       CAST(count(*) AS BIGINT) AS n
FROM ({selects})
GROUP BY src_repo, tgt_repo, change_type, element_type
ORDER BY src_repo, tgt_repo, change_type, element_type"""
    )


def merge_conflicts_sql(
    corpus_path: str, base: str, ours: str, theirs: str
) -> str:
    """Three-way merge conflicts = paths changed in BOTH diff(base,ours)
    and diff(base,theirs) (ontology_diff.py:617-618)."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _diff_block("o", base, ours)
        + ","
        + _diff_block("h", base, theirs)
        + """
SELECT DISTINCT o.path AS path, o.element_type AS element_type
FROM (SELECT DISTINCT path, element_type FROM ch_o) o
JOIN (SELECT DISTINCT path FROM ch_h) h USING (path)
ORDER BY path, element_type"""
    )


def merged_rules_sql(
    corpus_path: str, base: str, ours: str, theirs: str
) -> str:
    """Merged business-rule census: ours' rules ∪ theirs' rules whose
    name was ADDED by diff(base,theirs) at a non-conflicting path
    (ontology_diff.py:642-720, ours-priority merge)."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _RULES
        + ","
        + _diff_block("o", base, ours)
        + ","
        + _diff_block("h", base, theirs)
        + f""",
conflict_paths AS (
    SELECT DISTINCT o.path
    FROM (SELECT DISTINCT path FROM ch_o) o
    JOIN (SELECT DISTINCT path FROM ch_h) h USING (path)),
adopted AS (
    SELECT DISTINCT element_name FROM ch_h
    WHERE element_type = 'rule' AND change_type = 'added'
      AND path NOT IN (SELECT path FROM conflict_paths))
SELECT name, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT rule_name AS name FROM rules WHERE repo = '{ours}'
    UNION ALL
    SELECT rule_name FROM rules WHERE repo = '{theirs}'
      AND rule_name IN (SELECT element_name FROM adopted))
GROUP BY name ORDER BY name"""
    )


def contract_permissions_sql(corpus_path: str) -> str:
    """Agent read-set (contract_builder.py:113-151): entity names ∪
    relationship endpoints ∪ measure-dependency tables, with the sorted
    provenance set per entity."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + ","
        + _ALL_MEASURES
        + """,
perm_src AS (
    SELECT repo, dataset, entity, 'entity' AS source FROM ent2
    UNION ALL
    SELECT repo, dataset, from_e AS entity, 'relationship' FROM rel2
    UNION ALL
    SELECT repo, dataset, to_e AS entity, 'relationship' FROM rel2
    UNION ALL
    SELECT repo, dataset, string_split(dep, '.')[1] AS entity,
           'measure_dependency' AS source
    FROM (SELECT repo, dataset, unnest(deps) AS dep
          FROM dep_lists WHERE dataset <> 'Standalone')
    WHERE contains(dep, '.'))
SELECT repo, dataset, entity,
       array_to_string(list_sort(list_distinct(list(source))), ',')
           AS sources
FROM perm_src GROUP BY repo, dataset, entity
ORDER BY repo, dataset, entity"""
    )


def ontoguard_bindings_sql(corpus_path: str) -> str:
    """OntoGuard schema bindings (export/ontoguard.py:100-130):
    snake_case expected columns, default physical source
    ``sql_db.dbo.<snake(entity)>``, PK = first unique property by array
    position."""
    snake_p = _SNAKE.format(e="coalesce(cols[i].name, '')")
    snake_e = _SNAKE.format(e="e.entity")
    return (
        "WITH "
        + _prelude(corpus_path)
        + f""",
prop_pos AS (
    SELECT repo, dataset, entity, i - 1 AS pos,
           {snake_p} AS physical,
           (coalesce(cols[i].isUnique, FALSE) OR
            coalesce(cols[i].isKey, FALSE)) AS uniq
    FROM ent, unnest(range(1, len(cols) + 1)) AS _(i)),
og AS (
    SELECT repo, dataset, entity,
           list_sort(list(physical)) AS expected_columns,
           arg_min(physical, pos) FILTER (WHERE uniq) AS primary_key
    FROM prop_pos GROUP BY repo, dataset, entity)
SELECT e.repo AS repo, e.dataset AS dataset, e.entity AS entity,
       'sql_db.dbo.' || {snake_e} AS physical_source,
       coalesce(array_to_string(o.expected_columns, '|'), '')
           AS expected_columns,
       coalesce(o.primary_key, '') AS primary_key
FROM ent2 e LEFT JOIN og o
  ON e.repo = o.repo AND e.dataset = o.dataset AND e.entity = o.entity
ORDER BY repo, dataset, entity"""
    )


def fabric_entities_sql(corpus_path: str) -> str:
    """Fabric IQ per-entity export docs (export/fabric_iq.py:32-107):
    DuckDB re-renders the EXACT sorted JSON strings the engine emits
    via to_json(array_sort(collect_list(struct(...)))) — DuckDB's
    to_json uses the same compact `{"k":v}` form, and the ORDER BY in
    the list aggregate reproduces Spark's struct-tuple array_sort."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + """,
fab_props AS (
    SELECT repo, dataset, entity,
           to_json(list(struct_pack(
                       name := pname, type := otype,
                       required := required, "unique" := uniq)
                   ORDER BY pname, otype, required, uniq))
               AS properties_json
    FROM prop GROUP BY repo, dataset, entity),
fab_rels AS (
    SELECT repo, dataset, from_e AS entity,
           to_json(list(struct_pack(
                       target := to_e, type := rel_type,
                       cardinality := card)
                   ORDER BY to_e, rel_type, card))
               AS relationships_json
    FROM rel2 GROUP BY repo, dataset, from_e)
SELECT e.repo AS repo, e.dataset AS dataset, e.entity AS entity,
       e.entity_type AS entity_type,
       coalesce(p.properties_json, '[]') AS properties_json,
       coalesce(r.relationships_json, '[]') AS relationships_json
FROM ent2 e
LEFT JOIN fab_props p
  ON p.repo = e.repo AND p.dataset = e.dataset AND p.entity = e.entity
LEFT JOIN fab_rels r
  ON r.repo = e.repo AND r.dataset = e.dataset AND r.entity = e.entity
ORDER BY repo, dataset, entity"""
    )


def json_schema_sql(corpus_path: str) -> str:
    """Draft-07 JSON Schema docs (export/json_schema.py:31-99): the
    properties map is a DuckDB MAP built from name-sorted lists (same
    key order as Spark's map_from_entries(array_sort(...))); required[]
    is the filtered sorted name list; to_json(struct_pack(...)) emits
    the same compact field order as Spark's to_json(struct(...))."""
    jt = (
        "CASE otype WHEN 'String' THEN 'string' WHEN 'Integer' THEN "
        "'integer' WHEN 'Decimal' THEN 'number' WHEN 'Boolean' THEN "
        "'boolean' WHEN 'Date' THEN 'string' WHEN 'DateTime' THEN "
        "'string' ELSE 'string' END"
    )
    return (
        "WITH "
        + _prelude(corpus_path)
        + f""",
js_agg AS (
    SELECT repo, dataset, entity,
           map(list(pname ORDER BY pname),
               list(struct_pack(type := {jt}) ORDER BY pname)) AS props,
           list(pname ORDER BY pname) FILTER (WHERE required) AS req
    FROM prop GROUP BY repo, dataset, entity)
SELECT e.repo AS repo, e.dataset AS dataset, e.entity AS entity,
       to_json(struct_pack(
           "$schema" := 'http://json-schema.org/draft-07/schema#',
           title := e.entity,
           type := 'object',
           properties := a.props,
           required := coalesce(a.req, []))) AS json_schema
FROM ent2 e
LEFT JOIN js_agg a
  ON a.repo = e.repo AND a.dataset = e.dataset AND a.entity = e.entity
ORDER BY repo, dataset, entity"""
    )


def schema_drift_sql(corpus_path: str) -> str:
    """schema_mapper.py:77-254 set semantics over snake_case bindings,
    with the same deterministic synthetic drift as the Spark query
    (drop risk_score, retype temperature)."""
    return (
        "WITH "
        + _prelude(corpus_path)
        + r""",
bindings AS (
    SELECT DISTINCT repo, dataset, entity,
           lower(regexp_replace(regexp_replace(pname,
               '(.)([A-Z][a-z]+)', '\1_\2', 'g'),
               '([a-z0-9])([A-Z])', '\1_\2', 'g')) AS col,
           otype AS expected_type
    FROM prop),
actual AS (
    SELECT repo, dataset, entity, col,
           CASE WHEN col = 'temperature' THEN 'String'
                ELSE expected_type END AS col_type
    FROM bindings WHERE col <> 'risk_score'),
missing AS (
    SELECT b.* FROM bindings b ANTI JOIN actual a
      USING (repo, dataset, entity, col)),
newcols AS (
    SELECT a.* FROM actual a ANTI JOIN bindings b
      USING (repo, dataset, entity, col)),
renamed AS (
    -- rename heuristic (schema_mapper.py:208-217): empty here since the
    -- synthetic catalog only drops/retypes, but kept for faithfulness
    SELECT m.repo, m.dataset, m.entity, m.col AS missing_col,
           n.col AS new_col
    FROM missing m JOIN newcols n
      ON m.repo = n.repo AND m.dataset = n.dataset AND m.entity = n.entity
    WHERE contains(replace(replace(lower(n.col), '_', ''), '-', ''),
                   replace(replace(lower(m.col), '_', ''), '-', ''))
       OR contains(replace(replace(lower(m.col), '_', ''), '-', ''),
                   replace(replace(lower(n.col), '_', ''), '-', ''))),
drift AS (
    SELECT 'missing_column' AS drift_type, 'CRITICAL' AS severity
    FROM missing m
    WHERE NOT EXISTS (SELECT 1 FROM renamed r
        WHERE r.repo = m.repo AND r.dataset = m.dataset
          AND r.entity = m.entity AND r.missing_col = m.col)
    UNION ALL
    SELECT 'renamed_column', 'WARNING' FROM renamed
    UNION ALL
    SELECT 'type_change', 'WARNING'
    FROM bindings b JOIN actual a USING (repo, dataset, entity, col)
    WHERE b.expected_type <> a.col_type
    UNION ALL
    SELECT 'new_column', 'INFO'
    FROM newcols n
    WHERE NOT EXISTS (SELECT 1 FROM renamed r
        WHERE r.repo = n.repo AND r.dataset = n.dataset
          AND r.entity = n.entity AND r.new_col = n.col))
SELECT drift_type, severity, CAST(count(*) AS BIGINT) AS n
FROM drift GROUP BY drift_type, severity ORDER BY drift_type"""
    )
