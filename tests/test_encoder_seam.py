"""The encoder drop-in seam (E1/E2 production path): any batch function
must slot behind the same pandas_udf and feed the unchanged downstream
operators. The HF test proves a real transformer drops in when available
(skipped in environments without transformers/torch — like this sandbox)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mix_blink_spark.functions.embed import DIM, encode, make_encoder_udf


def test_default_factory_equals_module_udf(spark):
    df = spark.createDataFrame([("acme systems",), ("datum robotics",), (None,)], "s string")
    a = [r["e"] for r in df.select(encode(F.col("s")).alias("e")).collect()]
    b = [r["e"] for r in df.select(make_encoder_udf()(F.col("s")).alias("e")).collect()]
    for x, y in zip(a, b):
        assert x == y


def test_custom_batch_fn_drops_in(spark):
    """A stand-in 'model' with lazy per-worker init: proves closure
    capture ships stateful batch functions to executors and the full
    UDF path (Arrow in, array<float> out) runs unchanged."""
    state = {}

    def fake_model_batch(texts):
        if not state:  # lazy one-time init, as an HF load would be
            state["w"] = np.arange(1, 5, dtype=np.float32)
        out = np.zeros((len(texts), 4), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i] = state["w"] * (len(t) + 1)
        return out

    udf = make_encoder_udf(fake_model_batch)
    df = spark.createDataFrame([("ab",), ("xyz",)], "s string")
    got = {r["s"]: r["e"] for r in df.select("s", udf(F.col("s")).alias("e")).collect()}
    assert got["ab"] == [3.0, 6.0, 9.0, 12.0]
    assert got["xyz"] == [4.0, 8.0, 12.0, 16.0]


def test_hf_encoder_drops_in(spark):
    """Real-transformer smoke test (runs only where transformers+torch and
    a cached/downloadable tiny model exist). Verifies the CLS-pooled,
    L2-normalized contract end to end through Spark."""
    pytest.importorskip("transformers")
    pytest.importorskip("torch")
    from mix_blink_spark.functions.embed import hf_encode_batch

    try:
        fn = hf_encode_batch("prajjwal1/bert-tiny")
        fn(["warm up"])  # may fail offline with no cached weights
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"no usable HF model in this environment: {e}")

    udf = make_encoder_udf(fn)
    df = spark.createDataFrame([("acme corp",), ("acme corp.",), ("rivers in egypt",)], "s string")
    rows = df.select(udf(F.col("s")).alias("e")).collect()
    m = np.array([r["e"] for r in rows], dtype=np.float64)
    # unit norm
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-4)
    # near-identical surfaces more similar than unrelated text
    assert m[0] @ m[1] > m[0] @ m[2]
