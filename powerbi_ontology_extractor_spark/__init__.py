"""PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the *semantics* of
``vpakspace/powerbi-ontology-extractor`` (reference at /root/reference,
MIT) on an idiomatic Spark execution model: DataFrames + Catalyst for
every relational step, Arrow-vectorized pandas UDFs only for the
regex/tokenizer cores (DAX / M / report-layout parsing), hand-rolled
MinHash-LSH + large-star/small-star connected components for entity
canonicalization at web scale.

Input contract (BASELINE.json input_hint): a corpus table
``(repo, path, commit, lang, content)`` — one row per artifact file,
``lang ∈ {model_json, dax, m, report_json}`` — with a per-row
``sha256(content)`` invariant.

Output contract: a triples DataFrame
``(subj, pred, obj, obj_is_literal, obj_datatype, repo, dataset)``
matching the reference's rdflib emission grammar
(/root/reference/powerbi_ontology/export/owl.py), plus node/edge
tables and cross-dashboard analytics.
"""

__version__ = "0.1.0"

from powerbi_ontology_extractor_spark.session import get_spark  # noqa: F401
