#!/usr/bin/env python
"""Extra benchmarks — guide §1.4 noop-sink stage isolation.

NOT the driver-graded bench (bench.py is frozen); this file exists so
optimization work can attribute wall-clock to pipeline stages.  Reads
the same $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS contract.

Usage:
    python bench_extra.py minhash   # stage breakdown of minhash_dedup_docs
    python bench_extra.py kg        # stage breakdown of kg_build_triples
    python bench_extra.py rel       # the relational headline queries
"""

from __future__ import annotations

import json
import os
import sys
import time


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from powerbi_ontology_extractor_spark import get_spark

    spark = get_spark(app_name="pbi-kg-bench-extra", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    timings: dict[str, list[float]] = {}

    def timed(name: str, fn, trials: int = 2):
        walls = []
        for _ in range(trials):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
        timings[name] = walls

    if which == "minhash":
        from pyspark.sql import functions as F

        from powerbi_ontology_extractor_spark.operators.canonicalize import (
            lsh_candidate_pairs,
            make_minhash_udf,
        )
        from powerbi_ontology_extractor_spark.operators.dedup import (
            minhash_near_duplicates,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.count()  # warm scan
        d = docs.select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("text").alias("text"),
        )
        mh = make_minhash_udf(128, shingle_k=3, unit="word")

        # A: signature computation only
        timed("A_signatures", lambda: _noop(d.select("id", mh("text").alias("sig"))))
        # B: LSH candidate pairs (sig + banding + capped collect + dropDup)
        cand_count = {}

        def _b():
            cand_count["n"] = lsh_candidate_pairs(
                d, "id", "text", num_hashes=128, bands=32, unit="word", shingle_k=3
            ).count()

        timed("B_candidates", _b)
        # C: full path
        full_count = {}

        def _c():
            full_count["n"] = minhash_near_duplicates(
                docs, jaccard_threshold=0.7
            ).count()

        timed("C_full", _c)
        timings["_counts"] = [cand_count["n"], full_count["n"]]

    elif which == "kg":
        from powerbi_ontology_extractor_spark.operators.extract import (
            checkpoint_parallel,
            parse_models,
        )
        from powerbi_ontology_extractor_spark.pipeline import (
            _extract_generate_single_barrier,
            build_triples,
        )
        from powerbi_ontology_extractor_spark.sources.corpus import corpus_df

        kg_repos = int(os.environ.get("SPARK_GRAFT_KG_REPOS", "400"))
        # same warm-up as bench.py
        build_triples(corpus_df(spark, n_repos=4)).count()
        corpus = corpus_df(
            spark, n_repos=kg_repos, num_partitions=max(cpus, 8)
        ).persist()
        corpus.count()

        # A: parse + models checkpoint only
        timed(
            "A_models_ckpt",
            lambda: parse_models(corpus).localCheckpoint(eager=True).count(),
            trials=2,
        )
        # B: full barrier round (models ckpt + 6-frame concurrent round)
        timed(
            "B_barrier_round",
            lambda: _extract_generate_single_barrier(corpus),
            trials=2,
        )
        # C: full build (what bench.py times)
        timed("C_full_build", lambda: build_triples(corpus).count(), trials=2)
        # D: DAG construction + analysis only (no action): how much is
        # driver-side plan building?
        def _dag_only():
            t = build_triples(corpus)
            t.schema  # forces analysis, not execution

        timed("D_dag_analysis", _dag_only, trials=2)

    elif which == "rel":
        import __spark_entry__ as entry

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
            q[name](spark, sf_dir).count()  # warm each plan once
            timed(name, lambda n=name: q[n](spark, sf_dir).count(), trials=2)

    print(json.dumps({"which": which, "sf_dir": sf_dir, "cpus": cpus,
                      "loadavg": os.getloadavg()[0], "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
