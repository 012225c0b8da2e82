"""The committed corpus parquet fixture must stay byte-equivalent to
the deterministic generator — the kg_* correctness gate depends on both
engines reading the same rows."""

import os

import pyarrow.parquet as pq

from powerbi_ontology_extractor_spark.sources.corpus import (
    synth_corpus_rows,
    write_corpus_parquet,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "kg_corpus_6.parquet",
)


def test_fixture_matches_generator():
    write_corpus_parquet(FIXTURE, n_repos=6)
    table = pq.read_table(FIXTURE)
    got = sorted(zip(*(table.column(i).to_pylist() for i in range(6))))
    want = sorted(synth_corpus_rows(n_repos=6))
    assert got == want


def test_fixture_sha_invariant():
    import hashlib

    table = pq.read_table(FIXTURE)
    contents = table.column("content").to_pylist()
    shas = table.column("content_sha256").to_pylist()
    for c, s in zip(contents, shas):
        assert hashlib.sha256(c.encode("utf-8")).hexdigest() == s
