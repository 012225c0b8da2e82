#!/bin/sh
# Package the engine for `spark-submit --py-files` (north-rule submit path):
#   ./make_pyfiles.sh && spark-submit --py-files dist/pbi_kg.zip your_job.py
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/pbi_kg.zip
python -c "
import zipfile, pathlib
with zipfile.ZipFile('dist/pbi_kg.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path('powerbi_ontology_extractor_spark').rglob('*.py')):
        z.write(p, p.as_posix())
print('wrote dist/pbi_kg.zip')
"
