"""Property-based invariants (hypothesis, SURVEY §5): decode round-trips
over arbitrary pixel/sample data, scrub idempotence, dedup-family
algebra.  Spark-backed properties batch each example into ONE job and
keep example counts small; pure-numpy properties run wide."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from janusgraph_clickhouse_spark.llm import dedup as D
from janusgraph_clickhouse_spark.llm import multimodal as M
from janusgraph_clickhouse_spark.llm import text as X

# deterministic, CI-friendly
FAST = settings(max_examples=20, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])
SPARK_FAST = settings(max_examples=5, deadline=None,
                      suppress_health_check=[
                          HealthCheck.function_scoped_fixture])


@FAST
@given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 999))
def test_ppm_bmp_decode_roundtrip(w, h, seed):
    """encode→decode is the identity for ANY pixel array, and the PPM
    and BMP encodings of the same pixels decode identically."""
    import struct
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    ppm = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
    row_pad = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y, :, ::-1].tobytes()
        body += row + b"\0" * (row_pad - len(row))
    off = 54
    bmp = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0) + bytes(body))
    assert np.array_equal(M.decode_image(ppm), px)
    assert np.array_equal(M.decode_image(bmp), px)


@FAST
@given(n=st.integers(1, 500), channels=st.integers(1, 2),
       rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 999))
def test_wav_decode_roundtrip(n, channels, rate, seed):
    import struct
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=(n, channels),
                          dtype=np.int16)
    raw = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(raw)) + raw)
    got, got_rate = M.decode_audio(wav)
    assert got_rate == rate
    assert np.array_equal(got, samples)


_WORD = st.text(alphabet="abcxyz@.:/019+()- ", min_size=0, max_size=12)
_TEXTS = st.lists(_WORD, min_size=1, max_size=6)


@SPARK_FAST
@given(texts=_TEXTS)
def test_scrub_pii_idempotent(spark, texts):
    """Scrubbing already-scrubbed text is a no-op: the replacement token
    matches no pattern, so scrub∘scrub == scrub (and the second pass
    counts only whatever survives — which the first pass then proves
    it removed)."""
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    once = X.scrub_pii(df, "text").select("doc_id", "text")
    twice = X.scrub_pii(once, "text")
    rows = twice.collect()
    scrubbed = {r.doc_id: r.text for r in once.collect()}
    for r in rows:
        assert r.text == scrubbed[r.doc_id]
        assert (r.pii_email, r.pii_url, r.pii_phone) == (0, 0, 0)


@SPARK_FAST
@given(docs=st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12)
    .map(" ".join),
    min_size=2, max_size=6))
def test_jaccard_pairs_algebra(spark, docs):
    """Canonical ordering, (0, 1] range, and exact-1 iff identical
    shingle sets — over arbitrary tiny corpora."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.01,
                          allow_quadratic=True).collect()
    sh = {i: set() for i, _ in rows}
    for i, t in rows:
        w = t.split(" ")
        for j in range(len(w) - 1):
            sh[i].add((w[j], w[j + 1]))
    for r in got:
        assert r.doc_a < r.doc_b
        assert 0 < r.jaccard <= 1
        a, b = sh[r.doc_a], sh[r.doc_b]
        exact = len(a & b) / len(a | b)
        assert abs(r.jaccard - round(exact, 6)) < 1e-9
        if r.jaccard == 1.0:
            assert a == b


@SPARK_FAST
@given(seed=st.integers(0, 10_000))
def test_shared_spans_report_true_substrings(spark, seed):
    """Every reported span must be a literal token-for-token match at
    the reported offsets — checked against the raw texts in Python."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    passage = [vocab[rng.randint(30)] for _ in range(rng.randint(16, 25))]
    def doc():
        pre = [f"u{rng.randint(1000)}" for _ in range(rng.randint(0, 8))]
        post = [f"v{rng.randint(1000)}" for _ in range(rng.randint(0, 8))]
        return pre + passage + post
    texts = [" ".join(doc()), " ".join(doc())]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    spans = D.shared_spans(df, "doc_id", "text", k=8,
                           min_tokens=16).collect()
    assert spans, "the planted passage must be found"
    toks = [t.split(" ") for t in texts]
    for r in spans:
        assert (toks[r.doc_a][r.start_a:r.start_a + r.n_tokens]
                == toks[r.doc_b][r.start_b:r.start_b + r.n_tokens])
