"""Pathological-skew caps: the degenerate inputs a 100-TB corpus WILL
contain (empty docs → one SimHash bucket; zero embedding vectors → one
LSH bucket; a hot entity name defined in thousands of dashboards) must
complete in bounded pairs, not quadratic ones.

Round-4 verdict items 1a-1c: every candidate-pair join now goes through
the capped groupBy-and-explode shape (capped_bucket_pairs) or the
fingerprint-group pre-aggregation (analytics), so these fixtures bound
the pair fan-out by policy instead of data luck.
"""

import pytest
from pyspark.sql import functions as F

from powerbi_ontology_extractor_spark.operators import analytics as A
from powerbi_ontology_extractor_spark.operators import dedup as DD
from powerbi_ontology_extractor_spark.operators.canonicalize import (
    capped_bucket_pairs,
)

N_HOT = 5000


def test_capped_bucket_pairs_two_phase_is_exact_prefix(spark):
    # one degenerate bucket of 500 ids; cap 100 → pairs are exactly the
    # C(100,2) pairs of the 100 lexicographically-smallest ids (the
    # salted two-phase slice must equal the single-phase global prefix)
    banded = spark.createDataFrame(
        [(f"id{i:04d}", 0, 7) for i in range(500)],
        "id string, band int, band_hash long",
    )
    pairs = capped_bucket_pairs(
        banded, ["band", "band_hash"], F.struct(F.col("id")), max_bucket=100
    ).select(F.col("p1.id").alias("id1"), F.col("p2.id").alias("id2"))
    rows = pairs.collect()
    assert len(rows) == 100 * 99 // 2
    seen = {r["id1"] for r in rows} | {r["id2"] for r in rows}
    assert seen == {f"id{i:04d}" for i in range(100)}
    assert all(r["id1"] < r["id2"] for r in rows)


def test_simhash_empty_docs_bounded(spark):
    # N_HOT empty docs all hash to signature 0 → one bucket per chunk;
    # uncapped this is ~12.5M pairs; capped it is ≤ C(200,2)
    rows = [(i, "") for i in range(N_HOT)]
    rows += [(N_HOT + 1, "the quick brown fox jumps over the lazy dog")]
    rows += [(N_HOT + 2, "the quick brown fox jumps over the lazy hog")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = DD.simhash_near_duplicates(d, max_hamming=8, max_bucket=200)
    got = pairs.collect()
    cap_pairs = 200 * 199 // 2
    assert 0 < len(got) <= cap_pairs + 1
    # the genuine near-dup pair survives the degenerate flood
    real = {(r["id1"], r["id2"]) for r in got if r["id1"].startswith("500")}
    assert (str(N_HOT + 1), str(N_HOT + 2)) in real


def test_embedding_zero_vectors_bounded(spark):
    # N_HOT all-zero vectors collide into one (band, bucket) key in
    # every band; the cap bounds candidates, and cosine(0,0)=0 keeps
    # them out of the result; the genuine near-identical pair survives
    dim = 8
    rows = [(i, [0.0] * dim) for i in range(N_HOT)]
    rows += [(N_HOT + 1, [1.0, 0.2, 0.1, 0.0, 0.3, 0.9, 0.5, 0.4])]
    rows += [(N_HOT + 2, [1.0, 0.21, 0.1, 0.0, 0.3, 0.9, 0.5, 0.4])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = DD.embedding_near_duplicates(
        e, threshold=0.99, planes=4, max_bucket=200
    ).collect()
    assert {(r["id1"], r["id2"]) for r in got} == {
        (str(N_HOT + 1), str(N_HOT + 2))
    }


def test_fingerprint_matches_boilerplate_bounded(spark):
    # N_HOT identical docs share every winnow hash → each posting list
    # holds all N_HOT ids; uncapped that is ~12.5M pairs per hash,
    # capped it is ≤ C(cap, 2) distinct pairs total (the same 200
    # smallest ids survive every hash's slice), and a genuine partial
    # overlap outside the flood still surfaces
    from powerbi_ontology_extractor_spark.operators import text as TX

    boiler = "common license header appearing verbatim in every file"
    rows = [(i, boiler) for i in range(N_HOT)]
    rows += [(N_HOT + 1, f"alpha preamble. {boiler} alpha tail.")]
    rows += [(N_HOT + 2, f"beta preamble. {boiler} beta tail.")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = TX.fingerprint_matches(
        TX.fingerprints(d), min_shared=3, max_bucket=200
    ).collect()
    cap_pairs = 200 * 199 // 2
    assert 0 < len(got) <= cap_pairs + 2 * 200 + 1
    assert (N_HOT + 1, N_HOT + 2) in {(r["id1"], r["id2"]) for r in got}


@pytest.fixture(scope="module")
def hot_props(spark):
    # entity 'Date' bound identically in N_HOT dashboards (ONE
    # fingerprint group → zero same-group pairs) plus two dashboards
    # with a divergent property set
    rows = []
    for i in range(N_HOT):
        for p in ("Year", "Month"):
            rows.append((f"r{i:05d}", "D", "Date", 0, p, "Int64",
                         False, False, "", p))
    for src in ("x0", "x1"):
        for p in ("Year", "Week"):
            rows.append((src, "D", "Date", 0, p, "Int64",
                         False, False, "", p))
    return spark.createDataFrame(
        rows,
        "repo string, dataset string, entity string, pos int, "
        "property string, data_type string, required boolean, "
        "unique boolean, description string, source_column string",
    )


def test_entity_conflicts_debt_hot_name_bounded(hot_props):
    # pairs exist ONLY across the two distinct property sets:
    # N_HOT × 2 rows, not C(N_HOT+2, 2) ≈ 12.5M
    rows = A.entity_conflicts_debt(hot_props).collect()
    assert len(rows) == N_HOT * 2
    assert all(r["only_in_1"] == ["Month"] or r["only_in_2"] == ["Month"]
               for r in rows)
    # and the exemplar cap is a live policy: max_group=50 bounds output
    capped = A.entity_conflicts_debt(hot_props, max_group=50).collect()
    assert len(capped) == 50 * 2


def test_entity_structure_conflicts_hot_name_bounded(hot_props):
    rows = A.entity_structure_conflicts(hot_props).collect()
    assert len(rows) == N_HOT * 2
    r = rows[0]
    assert r["definition1"] == "2 properties"
    assert r["definition2"] == "2 properties"
    assert r["dashboard1"] < r["dashboard2"]


def test_exact_dedup_mega_duplicate_no_window_sort(spark):
    # N_HOT byte-identical docs (boilerplate) + two singletons: the
    # keep-representative path must be a hash AGGREGATE (partial
    # map-side combine bounds per-task state), not a row_number window
    # whose per-group sort puts the whole hot group in one task.
    rows = [(i, "boilerplate " * 20) for i in range(N_HOT)]
    rows += [(N_HOT + 1, "unique one"), (N_HOT + 2, "unique two")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kept = DD.exact_dedup(d)
    got = sorted(r["doc_id"] for r in kept.collect())
    assert got == [0, N_HOT + 1, N_HOT + 2]
    plan = kept._sc._jvm.PythonSQLUtils.explainString(
        kept._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    # min_by over a struct plans as SortAggregate (struct-typed buffer);
    # what matters for skew is the PARTIAL map-side combine, present in
    # every aggregate flavor and absent from a window
    assert any(
        n in plan for n in ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
    )
