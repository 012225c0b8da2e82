import pytest

from powerbi_ontology_extractor_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pbi-kg-tests", parallelism=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("PBI_KG_TEST_SF_DIR", "/root/testdata/sf0.001")
