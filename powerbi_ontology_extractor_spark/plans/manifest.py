"""Resumable staged execution with a per-stage manifest.

North-rule requirement: "every stage checkpoints per-partition lineage
and triple counts for resumable runs".  The reference has no
counterpart (single-process, rerun-from-scratch); this module gives the
pipeline restartability semantics:

- each stage writes its output table to ``<run_dir>/<stage>`` (parquet
  locally, Iceberg on a cluster) and appends a manifest record:
  stage name, status, row count, per-partition row counts (lineage),
  input-corpus sha fingerprint, wall ms;
- a restarted run verifies the manifest + output existence + the corpus
  fingerprint and SKIPS completed stages (idempotent re-run);
- a changed corpus fingerprint invalidates all downstream stages.

The manifest itself is a JSON-lines file (tiny, driver-written,
atomic-rename per append) — the equivalent of an Iceberg ``_manifest``
table.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageRecord:
    stage: str
    status: str  # completed | failed
    rows: int
    partitions: int
    partition_rows: list[int]
    corpus_fingerprint: str
    wall_ms: int
    out_path: str


class ManifestRunner:
    """Run (stage_name → DataFrame-producing fn) steps with skip-on-
    restart semantics."""

    def __init__(self, spark: SparkSession, run_dir: str):
        self.spark = spark
        self.run_dir = run_dir
        self.manifest_path = os.path.join(run_dir, "_manifest.jsonl")
        os.makedirs(run_dir, exist_ok=True)

    # -- manifest io -----------------------------------------------------

    def records(self) -> list[StageRecord]:
        if not os.path.exists(self.manifest_path):
            return []
        out = []
        with open(self.manifest_path) as f:
            for line in f:
                if line.strip():
                    out.append(StageRecord(**json.loads(line)))
        return out

    def _append(self, rec: StageRecord) -> None:
        tmp = self.manifest_path + ".tmp"
        lines = [json.dumps(asdict(r)) for r in self.records()] + [
            json.dumps(asdict(rec))
        ]
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, self.manifest_path)

    def completed(self, corpus_fingerprint: str) -> dict[str, StageRecord]:
        return {
            r.stage: r
            for r in self.records()
            if r.status == "completed"
            and r.corpus_fingerprint == corpus_fingerprint
            and os.path.exists(os.path.join(r.out_path, "_SUCCESS"))
        }

    # -- fingerprint -----------------------------------------------------

    @staticmethod
    def corpus_fingerprint(corpus: DataFrame) -> str:
        """Order-insensitive fingerprint over the per-row sha256 column
        (the per-row content invariant doubles as the lineage id)."""
        row = corpus.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("content_sha256").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return f"{row['n']}:{row['h']}"

    # -- execution ---------------------------------------------------------

    def run_stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        corpus_fingerprint: str,
        partition_cols: list[str] | None = None,
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Produce-or-reload one stage.  Completed (same fingerprint,
        output intact) → reload parquet, skip compute."""
        out_path = os.path.join(self.run_dir, name)
        done = self.completed(corpus_fingerprint)
        if name in done:
            return self.spark.read.parquet(out_path)

        t0 = time.perf_counter()
        df = fn()
        writer_df = df
        if partition_cols and num_partitions:
            writer_df = df.repartition(num_partitions, *partition_cols)
        writer_df.write.mode("overwrite").parquet(out_path)
        reloaded = self.spark.read.parquet(out_path)
        part_rows = [
            r["rows"]
            for r in reloaded.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("rows"))
            .orderBy("p")
            .collect()
        ]
        rec = StageRecord(
            stage=name,
            status="completed",
            rows=sum(part_rows),
            partitions=len(part_rows),
            partition_rows=part_rows,
            corpus_fingerprint=corpus_fingerprint,
            wall_ms=int((time.perf_counter() - t0) * 1000),
            out_path=out_path,
        )
        self._append(rec)
        return reloaded


def run_pipeline_resumable(
    spark: SparkSession,
    corpus: DataFrame,
    run_dir: str,
    repo_buckets: int = 16,
) -> dict[str, DataFrame]:
    """The full KG pipeline as resumable stages: extract → ontology →
    triples → nodes/edges, each persisted with manifest records.

    A rerun after a crash (or a no-op rerun) recomputes nothing whose
    output is intact for the same corpus fingerprint.
    """
    from powerbi_ontology_extractor_spark.functions.layout import report_triples
    from powerbi_ontology_extractor_spark.functions.mquery import (
        m_datasource_triples,
    )
    from powerbi_ontology_extractor_spark.operators.extract import extract_all
    from powerbi_ontology_extractor_spark.operators.ontology import (
        generate_ontology,
    )
    from powerbi_ontology_extractor_spark.operators.triples import (
        TRIPLE_COLS,
        export_triples,
    )
    from powerbi_ontology_extractor_spark.pipeline import nodes_edges

    runner = ManifestRunner(spark, run_dir)
    fp = runner.corpus_fingerprint(corpus)

    # bad-row quarantine: rows failing the content-sha invariant are
    # excluded from every stage and surfaced in their own table
    from powerbi_ontology_extractor_spark.sources.corpus import verify_content_sha

    bad = runner.run_stage("corrupt_rows", lambda: verify_content_sha(corpus), fp)
    good = corpus.join(
        bad.select("repo", "path"), ["repo", "path"], "left_anti"
    )

    def stage_triples() -> DataFrame:
        model_dfs = extract_all(good, materialize=True)
        onto_dfs = generate_ontology(model_dfs, materialize=True)
        t = export_triples(onto_dfs, model_dfs)
        t = t.unionByName(
            m_datasource_triples(good, model_dfs["datasets"])
        ).unionByName(report_triples(good, model_dfs["datasets"]))
        return t.dropDuplicates(TRIPLE_COLS)

    triples = runner.run_stage(
        "triples", stage_triples, fp, partition_cols=["repo"],
        num_partitions=repo_buckets,
    )
    nodes = runner.run_stage(
        "nodes", lambda: nodes_edges(triples)[0], fp,
        partition_cols=["repo"], num_partitions=max(repo_buckets // 4, 1),
    )
    edges = runner.run_stage(
        "edges", lambda: nodes_edges(triples)[1], fp,
        partition_cols=["repo"], num_partitions=max(repo_buckets // 4, 1),
    )
    return {"triples": triples, "nodes": nodes, "edges": edges, "corrupt_rows": bad}
