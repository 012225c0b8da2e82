"""Ground-truth evaluation harness: P/R/F1 as DataFrame joins.

Reference semantics: /root/reference/evaluation/run_evaluation.py
- fuzzy name normalization (:120-122): lower, _/- → space, trim
- entity matching (:125-133): normalized-name set ∩ / −  → TP/FP/FN
- relationship matching (:136-151): key = (norm(from), norm(to)),
  FK column ignored
- P/R/F1 with zero-denominator guards (:85-105)

Extended with triple-set P/R (the engine's actual success gate:
P/R ≥ 0.95 triple agreement vs reference golden ontologies) — an
inner/anti join over full triple rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.functions.naming import normalize_name


def _prf(tp: int, fp: int, fn: int) -> dict:
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
    }


def match_entities(
    extracted: DataFrame, truth: DataFrame, name_col: str = "entity"
) -> dict:
    """Entity P/R via normalized-name set joins (E1)."""
    e = extracted.select(
        normalize_name(F.col(name_col)).alias("k")
    ).dropDuplicates()
    t = truth.select(normalize_name(F.col(name_col)).alias("k")).dropDuplicates()
    tp = e.join(t, "k", "inner").count()
    fp = e.join(t, "k", "left_anti").count()
    fn = t.join(e, "k", "left_anti").count()
    return _prf(tp, fp, fn)


def match_relationships(
    extracted: DataFrame,
    truth: DataFrame,
    from_col: str = "from_entity",
    to_col: str = "to_entity",
) -> dict:
    """Relationship P/R on (norm(from), norm(to)) keys (E2) — FK
    columns deliberately ignored, as the reference."""

    def keys(df: DataFrame) -> DataFrame:
        return df.select(
            normalize_name(F.col(from_col)).alias("kf"),
            normalize_name(F.col(to_col)).alias("kt"),
        ).dropDuplicates()

    e, t = keys(extracted), keys(truth)
    tp = e.join(t, ["kf", "kt"], "inner").count()
    fp = e.join(t, ["kf", "kt"], "left_anti").count()
    fn = t.join(e, ["kf", "kt"], "left_anti").count()
    return _prf(tp, fp, fn)


def match_triples(
    extracted: DataFrame,
    golden: DataFrame,
    keys: Sequence[str] = ("subj", "pred", "obj"),
) -> dict:
    """Triple-set P/R — the P/R ≥ 0.95 agreement gate.  Exact row-set
    comparison over (subj, pred, obj) (+ any extra keys the caller
    includes, e.g. repo/dataset for corpus-wide comparison)."""
    cols = list(keys)
    e = extracted.select(*cols).dropDuplicates()
    g = golden.select(*cols).dropDuplicates()
    tp = e.join(g, cols, "inner").count()
    fp = e.join(g, cols, "left_anti").count()
    fn = g.join(e, cols, "left_anti").count()
    return _prf(tp, fp, fn)
