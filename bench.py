#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the KG-construction pipeline (corpus → triples, the
engine's raison d'être, reported as triples/sec against the reference's
~14,150 triples/s single-core baseline in BASELINE.md) + the heavy
relational/dedup queries from __spark_entry__.

Usage:
    python bench.py                     # sf0.1, 32 cores
    SPARK_GRAFT_CPUS=8 python bench.py  # scaling point
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    kg_repos = int(os.environ.get("SPARK_GRAFT_KG_REPOS", "400"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from powerbi_ontology_extractor_spark import get_spark
    from powerbi_ontology_extractor_spark.pipeline import build_triples
    from powerbi_ontology_extractor_spark.sources.corpus import corpus_df
    from powerbi_ontology_extractor_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    spark = get_spark(
        app_name="pbi-kg-bench",
        parallelism=cpus,
        # UI on: the REST API is how shuffle-write bytes are measured
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def shuffle_write_mb() -> float | None:
        """Total shuffle-write MB so far (Spark UI REST)."""
        import urllib.request

        try:
            app_id = spark.sparkContext.applicationId
            url = (
                f"http://localhost:4055/api/v1/applications/{app_id}"
                "/stages?status=complete"
            )
            stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
            return sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6
        except Exception:
            return None

    timings: dict[str, float] = {}
    all_trials: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    # warm the JVM/Arrow/codegen paths so timings measure the queries,
    # not first-plan compilation (~20s of whole-stage-codegen JIT)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    build_triples(corpus_df(spark, n_repos=4)).count()

    def timed(name: str, fn, trials: int = 2):
        """Min-of-k in-session timing: the shared host's noise swings a
        single measurement up to ~25% (observed 12.2 → 15.1 s on the
        same query); every trial is a fresh DataFrame DAG (no shuffle
        or checkpoint reuse between them).  All trials are reported."""
        walls, result = [], None
        for _ in range(trials):
            t0 = time.perf_counter()
            result = fn()
            walls.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(walls)
        all_trials[name] = walls
        return result

    # 1. KG pipeline: corpus → triples (the flagship)
    corpus = corpus_df(
        spark, n_repos=kg_repos, num_partitions=max(cpus, 8)
    ).persist()
    corpus.count()  # materialize synthesis outside the timed window
    sw0 = shuffle_write_mb()
    n_triples = timed(
        "kg_build_triples", lambda: build_triples(corpus).count(), trials=1
    )
    sw1 = shuffle_write_mb()
    if sw0 is not None and sw1 is not None:
        extras["kg_shuffle_write_mb"] = round(sw1 - sw0, 1)
    # second kg trial AFTER the shuffle-write window so the delta stays
    # attributable to one run
    timed("kg_build_triples_t2", lambda: build_triples(corpus).count(), trials=1)
    walls = [timings.pop("kg_build_triples"), timings.pop("kg_build_triples_t2")]
    all_trials.pop("kg_build_triples_t2")
    timings["kg_build_triples"] = min(walls)
    all_trials["kg_build_triples"] = walls
    extras["kg_triples"] = n_triples
    extras["kg_repos"] = kg_repos
    extras["kg_triples_per_sec"] = round(n_triples / timings["kg_build_triples"], 1)
    n_artifacts = corpus.count()
    extras["kg_artifacts_per_sec"] = round(
        n_artifacts / timings["kg_build_triples"], 1
    )

    # 2. relational headline queries from the driver contract
    q = entry.queries()
    for name in [
        "q_pricing_summary",
        "q_top_orders",
        "q_region_volume",
        "q_top_order_per_customer",
        "q_events_hourly",
        "q_embed_topk",
        "q_docs_token_counts",
    ]:
        timed(name, lambda n=name: q[n](spark, sf_dir).count())

    # 3. near-dup dedup over documents (LSH + verify)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed(
        "minhash_dedup_docs",
        lambda: minhash_near_duplicates(docs, jaccard_threshold=0.7).count(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "trials": all_trials,
                "timing": "min of 2 in-session trials per query",
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
