"""Round-5 north-star widening: property tests for doc_chunks,
quality_classifier, mixture_temperature, corpus_diff, and
sampling_filtered (their Spark-vs-DuckDB hash parity runs in the
driver gate; these pin the semantics independently)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_doc_chunks_cover_and_overlap(spark):
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.text import CHUNK_STRIDE, CHUNK_WORDS, doc_chunks

    chunks = doc_chunks(spark, SF_SMOKE).toPandas()
    docs = load_table(spark, SF_SMOKE, "documents").toPandas()
    words = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    by_doc = chunks.groupby("doc_id")
    for doc_id, grp in by_doc:
        w = words[doc_id]
        grp = grp.sort_values("chunk_idx")
        # chunk count: one window per stride start
        assert len(grp) == (len(w) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        for r in grp.itertuples():
            start = r.chunk_idx * CHUNK_STRIDE
            want = w[start : start + CHUNK_WORDS]
            assert r.chunk.split(" ") == want
            assert r.n_words == len(want)
    # every word position is covered by at least one chunk
    doc0 = min(words)
    covered = np.zeros(len(words[doc0]), dtype=bool)
    for r in by_doc.get_group(doc0).itertuples():
        s = r.chunk_idx * CHUNK_STRIDE
        covered[s : s + r.n_words] = True
    assert covered.all()


def test_quality_classifier_deterministic_and_bounded(spark):
    from gemmsql.pipeline.text import quality_classifier

    a = quality_classifier(spark, SF_SMOKE).toPandas().sort_values("doc_id")
    b = quality_classifier(spark, SF_SMOKE).toPandas().sort_values("doc_id")
    assert (a["score"].to_numpy() == b["score"].to_numpy()).all()
    # mean of integer micro-weights in [-1000, 1000] -> score in [-1, 1]
    assert a["score"].abs().max() <= 1.0
    assert (a["keep"] == (a["score"] > 0)).all()


def test_mixture_temperature_smooths_toward_rare_domains(spark):
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.text import mixture_temperature

    kept = mixture_temperature(spark, SF_SMOKE).toPandas()
    corpus = (
        load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    rates = kept["lang"].value_counts().reindex(corpus.index).fillna(0) / corpus
    # alpha < 1 upsamples rare domains RELATIVE to dominant ones: the
    # largest domain's keep-rate must not exceed the smallest domain's
    big, small = corpus.idxmax(), corpus.idxmin()
    assert rates[big] <= rates[small] + 1e-9
    # expected keep probability is (s_d/S)*(T/n_d); spot-check en
    from gemmsql.pipeline.text import MIX_TEMP_SCALE

    s = np.floor(np.sqrt(corpus.to_numpy(dtype=float)) * MIX_TEMP_SCALE)
    t = corpus.sum() // 2
    expect = np.minimum(1.0, (s / s.sum()) * (t / corpus.to_numpy()))
    got = rates.to_numpy()
    assert np.abs(got - expect).max() < 0.25  # md5 gate is a fair coin


def test_guarded_long_fires_when_consumed(spark):
    """The overflow guard must be an EXECUTABLE assertion: Catalyst
    prunes a projected-then-dropped assert_true (r5 advisor finding),
    so the guard rides inside a consumed column — an always-false
    condition must raise even through an aggregate."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from gemmsql.pipeline.text import _guarded_long

    good = spark.range(5).select(
        _guarded_long(F.col("id") >= 0, F.col("id"), "never").alias("g")
    )
    assert good.agg(F.sum("g")).collect()[0][0] == 10
    bad = spark.range(5).select(
        _guarded_long(F.col("id") < 0, F.col("id"), "boom").alias("g")
    )
    with pytest.raises((PySparkException, Py4JJavaError), match="boom"):
        bad.agg(F.sum("g")).collect()


def test_corpus_diff_matches_direct_comparison(spark):
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.corpus import corpus_diff, corpus_v2

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    v1 = docs.toPandas().set_index("doc_id")["text"]
    v2 = corpus_v2(docs).toPandas().set_index("doc_id")["text"]
    got = corpus_diff(spark, SF_SMOKE).toPandas().set_index("doc_id")["change"]
    added = set(v2.index) - set(v1.index)
    removed = set(v1.index) - set(v2.index)
    both = set(v1.index) & set(v2.index)
    changed = {d for d in both if v1[d] != v2[d]}
    assert set(got[got == "added"].index) == added
    assert set(got[got == "removed"].index) == removed
    assert set(got[got == "changed"].index) == changed
    assert len(got) == len(added) + len(removed) + len(changed)
    for bucket in (added, removed, changed):
        assert bucket, "derived v2 must exercise every change kind"


def test_sampling_filtered_support_and_renorm(spark):
    from gemmsql.datamodel import embeddings_vectors
    from gemmsql.ops.sampling import TOPK_K, TOPP_P, sampling_filtered

    vec = embeddings_vectors(spark, SF_SMOKE).select("i", "vec")
    out = sampling_filtered(vec, vec).toPandas()
    pdf = vec.toPandas().sort_values("i")
    ids = pdf["i"].to_numpy()
    X = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
    S = X @ X.T
    pos = {int(v): k for k, v in enumerate(ids)}
    assert (out["prob"] > 0).all() and (out["prob"] <= 1.0).all()
    for r in out.itertuples():
        ri = pos[r.i]
        order = np.lexsort((ids, -S[ri]))
        if r.which == "topk":
            kept = set(ids[order[:TOPK_K]].tolist())
        else:
            e = np.exp(S[ri][order] - S[ri].max())
            cum_before = np.cumsum(e) - e
            kept = set(ids[order[cum_before < TOPP_P * e.sum()]].tolist())
        assert r.choice in kept, (r.which, r.i)


def test_image_container_invariance_corpus_wide(spark):
    """The SAME md5-derived pixels packed in PPM vs BMP containers
    must decode identically through decode_image's magic-byte dispatch
    — corpus-wide (the BMP leg was only fixture-tested before; this
    exercises bottom-up row order + 4-byte row padding on every doc's
    distinct geometry)."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.multimodal import (
        PPM_H_BASE,
        PPM_H_MOD,
        PPM_W,
        _ppm_body,
        decode_image,
        encode_bmp,
    )

    doc_ids = [
        r.doc_id
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id")
        .collect()
    ]
    assert len(doc_ids) >= 50
    for doc_id in doc_ids:
        h = PPM_H_BASE + int(doc_id) % PPM_H_MOD
        px = np.frombuffer(_ppm_body(int(doc_id), h), dtype=np.uint8)
        img = px.reshape(h, PPM_W, 3)
        ppm_payload = b"P6\n%d %d\n255\n" % (PPM_W, h) + px.tobytes()
        bmp_payload = encode_bmp(img)
        a = decode_image(ppm_payload)
        b = decode_image(bmp_payload)
        assert a.shape == b.shape == (h, PPM_W, 3)
        assert np.array_equal(a, b), f"container mismatch for doc {doc_id}"


def test_new_text_ops_edge_cases(spark):
    """Degenerate documents (empty text, single word) must not crash
    or mis-shape the round-5 narrow-map ops."""
    from gemmsql.pipeline.text import (
        CHUNK_STRIDE,
        pii_dirty_docs,
        pii_scrub,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "a b"), (4, " leading space")],
        "doc_id long, text string",
    )
    # chunking logic is exercised via the same split/sequence/slice
    # expressions doc_chunks uses, bound to this frame
    from pyspark.sql import functions as F

    ws = docs.select("doc_id", F.split("text", " ").alias("w"))
    starts = F.sequence(F.lit(0), F.size("w") - 1, F.lit(CHUNK_STRIDE))
    n_chunks = ws.select(
        "doc_id", F.size(starts).alias("n")
    ).toPandas().set_index("doc_id")["n"]
    # split("") -> [""] (one token), so every doc has >= 1 chunk window
    assert (n_chunks == 1).all()

    scrubbed = pii_scrub(docs).toPandas().set_index("doc_id")
    assert (scrubbed[["n_email", "n_ip", "n_phone"]].to_numpy() == 0).all()
    assert scrubbed.loc[1, "redacted"] == ""

    dirty = pii_dirty_docs(docs).toPandas()
    assert len(dirty) == 4 and dirty["text"].notna().all()


def test_sampling_filtered_non_identity_class_ids(spark):
    """Regression (r5 review): the emitted `choice` must be the CLASS ID
    rids[pos], not the column position.  Exercised with a class table
    whose ids are neither 0-based nor contiguous (filtered to even ids,
    then shifted by 100), cross-checked against an exact NumPy replay of
    score + seeded Gumbel noise over the restricted support."""
    import pandas as pd

    from pyspark.sql import functions as F

    from gemmsql.datamodel import embeddings_vectors
    from gemmsql.ops.sampling import (
        TOPK_K,
        TOPP_P,
        _gumbel_noise,
        sampling_filtered,
    )

    vec = embeddings_vectors(spark, SF_SMOKE).select("i", "vec")
    cls = (
        vec.filter(F.col("i") % 2 == 0)
        .select((F.col("i") + 100).alias("i"), "vec")
    )
    out = (
        sampling_filtered(vec, cls, seed=7)
        .toPandas()
        .set_index(["which", "i"])
        .sort_index()
    )
    lp = vec.toPandas().sort_values("i")
    rp = cls.toPandas().sort_values("i")
    lids = lp["i"].to_numpy(dtype=np.int64)
    rids = rp["i"].to_numpy(dtype=np.int64)
    L = np.asarray(lp["vec"].tolist(), dtype=np.float64)
    R = np.asarray(rp["vec"].tolist(), dtype=np.float64)
    assert set(out["choice"]) <= set(rids.tolist())
    S = L @ R.T
    G = _gumbel_noise(7, lids, rids)
    checked = 0
    for ri, i in enumerate(lids[:64]):
        order = np.lexsort((rids, -S[ri]))
        e = np.exp(S[ri][order] - S[ri].max())
        for which, keep in (
            ("topk", order[:TOPK_K]),
            ("topp", order[(np.cumsum(e) - e) < TOPP_P * e.sum()]),
        ):
            w = keep[np.argmax((S + G)[ri, keep])]
            assert out.loc[(which, i), "choice"] == rids[w], (which, i)
            checked += 1
    assert checked == 128


def test_sampling_filtered_handles_tiny_class_table(spark):
    """k larger than the class count must clamp, not fail."""
    import pandas as pd

    from gemmsql.ops.sampling import sampling_filtered

    pdf = pd.DataFrame(
        {"i": [0, 1, 2], "vec": [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]]}
    )
    vec = spark.createDataFrame(pdf)
    out = sampling_filtered(vec, vec, k=16).toPandas()
    assert len(out) == 6  # 3 rows x {topk, topp}
    assert set(out["choice"]) <= {0, 1, 2}
    assert (out["prob"] > 0).all()
