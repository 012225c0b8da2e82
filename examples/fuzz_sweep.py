"""Wide fuzz-parity sweep: seeded-random models 0..N-1 through the
LIVE reference exporter (tests/reference_harness) vs the engine's
triple build; prints any divergent seed.

This is the heavyweight sibling of tests/test_reference_fuzz.py (which
pins 12 seeds in the default suite): run it when the emission grammar
or the DAX regexes change.  Round-5 record: 150 seeds, 0 divergences,
0 reference crashes (~13.5 min on local[8]).

Usage:  python examples/fuzz_sweep.py [N]
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.reference_harness import canonicalize_bnodes, reference_triples
from tests.test_reference_fuzz import _mask_date, _random_model

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from powerbi_ontology_extractor_spark.operators.extract import extract_all
from powerbi_ontology_extractor_spark.operators.ontology import generate_ontology
from powerbi_ontology_extractor_spark.operators.triples import export_triples

os.makedirs("/tmp/fuzzsweep", exist_ok=True)
bad = []
t0 = time.time()
for seed in range(N):
    model = _random_model(seed)
    pbix = f"/tmp/fuzzsweep/f{seed}.pbix"
    try:
        ref, _ = reference_triples(model, pbix)
    except Exception as ex:  # reference itself crashed on this model
        print(f"seed {seed}: REFERENCE RAISED {type(ex).__name__}: {ex}")
        continue
    ref = _mask_date(ref)
    content = json.dumps(model)
    sha = hashlib.sha256(content.encode()).hexdigest()
    corpus = spark.createDataFrame(
        [("r", pbix, "0" * 40, "model_json", content, sha)],
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string",
    )
    dfs = extract_all(corpus)
    t = export_triples(generate_ontology(dfs), dfs, include_lineage=False)
    eng = _mask_date(canonicalize_bnodes(
        {(r["subj"], r["pred"], r["obj"])
         for r in t.select("subj", "pred", "obj").collect()}))
    if ref != eng:
        bad.append(seed)
        print(f"seed {seed}: DIVERGED  missing={sorted(ref - eng)[:6]} "
              f"extra={sorted(eng - ref)[:6]}")
    if seed % 25 == 24:
        print(f"... {seed + 1}/{N} done ({time.time() - t0:.0f}s)", flush=True)

print(f"SWEEP DONE: {N} seeds, divergent: {bad}")
spark.stop()
