import pytest

from search_engine_wikipedia_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s


@pytest.fixture(scope="session")
def corpus():
    """Deterministic 300-page synthetic corpus (driver-side)."""
    from search_engine_wikipedia_spark import synth

    return [synth.make_page(i, 300) for i in range(300)]


@pytest.fixture(scope="session")
def built_index(spark, corpus, tmp_path_factory):
    """Spark-built index + oracle over the same corpus."""
    import pandas as pd

    from search_engine_wikipedia_spark import schemas
    from search_engine_wikipedia_spark.operators.build import IndexBuilder
    from search_engine_wikipedia_spark.operators.pagerank import (
        build_pagerank_stage,
    )
    from tests.oracle import OracleIndex

    root = str(tmp_path_factory.mktemp("index"))
    pages = spark.createDataFrame(pd.DataFrame(corpus), schema=schemas.PAGES)
    builder = IndexBuilder(spark, root, n_segments=4, shard_size=200)
    builder.build(pages, resume=False)
    build_pagerank_stage(spark, root)
    oracle = OracleIndex(corpus)
    return root, oracle
