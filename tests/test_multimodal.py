"""Multimodal plumbing tests: binary payload columns, Arrow-batch
feature extraction, frame-sample fan-out, and the stubbed decode
contract. The codecs are stubbed (none in this container); everything
Spark-side — schema, batching, pruning, fan-out — is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_synthetic_media_schema(spark):
    from dask_awkward_sandbox_spark.functions import multimodal as mm

    df = mm.synthetic_media(spark, n=30)
    assert df.schema == mm.MEDIA_SCHEMA
    assert df.count() == 30
    kinds = {r["meta"]["kind"] for r in df.select("meta").collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_arrow_batch(spark):
    from dask_awkward_sandbox_spark.functions import multimodal as mm

    df = mm.synthetic_media(spark, n=30)
    out = mm.extract_features(df, dim=8)
    rows = out.collect()
    assert len(rows) == 30
    byid = {r["media_id"]: r for r in rows}
    # deterministic fake: recompute one feature driver-side
    payload = df.filter(F.col("media_id") == 3).collect()[0]["payload"]
    assert byid[3]["feature"] == pytest.approx(mm.fake_feature(payload, 8))
    assert byid[3]["n_bytes"] == len(payload)
    # payload column pruned from output schema
    assert "payload" not in out.columns


def test_frame_sample_plan_video_only(spark):
    from dask_awkward_sandbox_spark.functions import multimodal as mm

    df = mm.synthetic_media(spark, n=30)
    plan = mm.frame_sample_plan(df, every_n=10)
    rows = plan.collect()
    assert rows and all(r["frame_idx"] % 10 == 0 for r in rows)
    vids = {r["media_id"] for r in df.filter(F.col("meta")["kind"] == "video").collect()}
    assert {r["media_id"] for r in rows} == vids
    # 30 frames sampled every 10 -> indices 0,10,20
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 10, 20] for v in per.values())


def test_decode_stub_raises(spark):
    from dask_awkward_sandbox_spark.functions import multimodal as mm

    with pytest.raises(mm.DecodeUnavailable):
        mm.decode_image(b"\x89PNG")
