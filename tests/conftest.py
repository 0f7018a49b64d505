from __future__ import annotations

import pytest

from mix_blink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mbs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2048"},
    )
    s.sparkContext.setCheckpointDir("/tmp/mbs-test-checkpoints")
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    from mix_blink_spark.fixtures import corpus_dfs

    pages, ents, golds, pairs = corpus_dfs(spark, seed=42, n_pages=200, n_entities=20)
    pages = pages.cache()
    ents = ents.cache()
    golds = golds.cache()
    pairs = pairs.cache()
    pages.count(), ents.count(), golds.count(), pairs.count()
    return {"pages": pages, "entities": ents, "mentions_gold": golds, "labeled_pairs": pairs}
