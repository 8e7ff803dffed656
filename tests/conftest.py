import pytest


@pytest.fixture(scope="session")
def spark():
    from openie_backend_spark.session import get_spark

    s = get_spark(app_name="tests", parallelism=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    from openie_backend_spark import synth

    out = str(tmp_path_factory.mktemp("synth"))
    synth.write_corpus(out, n_pages=60)
    return out
