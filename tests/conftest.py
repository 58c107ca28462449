import pytest

from qualityspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="qualityspark-tests", master="local[4]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    """800 deterministic synthetic pages, cached for the whole session."""
    from qualityspark import synth
    df = synth.pages_df(spark, 800, partitions=4).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def oracle_small():
    from qualityspark import synth, oracle
    rows = list(synth.page_rows(800))
    return rows, oracle.audit_rows(rows)
