"""Text analysis, dedup, similarity, and multimodal plumbing tests against
brute-force / driver-provided-data oracles."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasterkit_spark.operators import dedup as DD
from rasterkit_spark.operators import multimodal as MM
from rasterkit_spark.operators import similarity as SIM
from rasterkit_spark.operators import text as TX

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def near_dup_docs(spark, documents):
    """Documents plus perturbed copies → known near-dup pairs."""
    base = documents.limit(30).toPandas()
    rows = []
    for r in base.itertuples():
        rows.append({"doc_id": int(r.doc_id), "text": r.text})
        rows.append({"doc_id": int(r.doc_id) + 100000,
                     "text": r.text + " extra tail"})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_token_count_matches_python(spark, documents):
    got = TX.token_count(documents).toPandas().set_index("doc_id")
    pdf = documents.select("doc_id", "text").toPandas()
    for r in pdf.itertuples():
        want = len(r.text.split()) if r.text.strip() else 0
        assert got.loc[r.doc_id, "ws_tokens"] == want, r.doc_id


def test_quality_score_sane(spark, documents):
    got = TX.quality_score(documents).toPandas()
    assert got.quality_score.between(25, 100).all()
    assert (got.ws_tokens > 0).all()


def test_lang_id_runs_and_en_docs_lean_en(spark, documents):
    got = TX.lang_id(documents).toPandas()
    # synthetic corpus text is English-word based → 'the'/'a' markers hit
    assert (got.lang_pred == "en").mean() > 0.5


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["ab cd", "cd ab", "ab cd"]}))
    got = TX.doc_fingerprint(df).toPandas().set_index("doc_id")
    assert got.loc[1, "fingerprint"] == got.loc[3, "fingerprint"]
    assert got.loc[1, "fingerprint"] != got.loc[2, "fingerprint"]


def test_exact_dedup(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["same text", "same text", "other", "same text"]}))
    got = DD.exact_dedup(df).toPandas()
    assert len(got) == 2
    dup = got[got.dup_count == 3]
    assert dup.iloc[0].rep_id == "a"
    pairs = DD.exact_dup_pairs(df).toPandas()
    assert set(zip(pairs.id_a, pairs.id_b)) == {("a", "b"), ("a", "d"),
                                                ("b", "d")}


def _brute_jaccard_pairs(pdf, n, threshold):
    def sh(t):
        return {t[i:i + n] for i in range(max(len(t) - n + 1, 1))}

    out = set()
    sets = {r.doc_id: sh(r.text) for r in pdf.itertuples()}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            # int() the RHS: 0.7*1e6 is 699999.999…, while the engine
            # filters on >= int(threshold*1e6) — a float RHS excludes
            # boundary pairs the engine correctly emits
            if uni and int(inter * 1e6 / uni) >= int(threshold * 1e6):
                out.add((a, b))
    return out


def test_ngram_jaccard_matches_bruteforce(spark, near_dup_docs):
    got = DD.ngram_jaccard_pairs(near_dup_docs, 0.7, n=5).toPandas()
    got_pairs = set(zip(got.id_a, got.id_b))
    want = _brute_jaccard_pairs(near_dup_docs.toPandas(), 5, 0.7)
    assert got_pairs == want
    assert len(want) >= 20  # the perturbed copies are near-dups


def test_minhash_lsh_finds_near_dups(spark, near_dup_docs):
    got = DD.minhash_lsh_pairs(near_dup_docs, 0.7).toPandas()
    got_pairs = set(zip(got.id_a, got.id_b))
    want = _brute_jaccard_pairs(near_dup_docs.toPandas(), 5, 0.7)
    # LSH may miss pairs (recall<1) but must never invent them (precision=1)
    assert got_pairs <= want
    assert len(got_pairs) >= 0.9 * len(want)


def test_simhash_pairs(spark, near_dup_docs):
    got = DD.simhash_pairs(near_dup_docs, max_hamming=6).toPandas()
    pairs = set(zip(got.id_a, got.id_b))
    assert (got.hamming <= 6).all()
    # the planted original/perturbed pairs must actually be found — a
    # bare count can be satisfied by unrelated short docs colliding
    base = {int(i) for i in near_dup_docs.toPandas().doc_id if i < 100000}
    planted_found = {(a, b) for a, b in pairs if b == a + 100000}
    assert len(planted_found) >= 0.5 * len(base), (
        f"only {len(planted_found)}/{len(base)} planted pairs found")


def test_embedding_dup_pairs_verified(spark, embeddings):
    e = embeddings.limit(120)
    got = DD.embedding_dup_pairs(e, 0.95, dim=64).toPandas()
    # verify every emitted pair with numpy cosine
    pdf = e.toPandas().set_index("vec_id")
    for r in got.itertuples():
        va = np.array(pdf.loc[r.id_a, "embedding"], dtype=np.float64)
        vb = np.array(pdf.loc[r.id_b, "embedding"], dtype=np.float64)
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert int(np.floor(cos * 1e6)) >= int(0.95 * 1e6)
        assert int(np.floor(cos * 1e6)) == r.cos_e6


def _seeded_near_dup_embeddings(n_base=200, n_dups=60, dim=64, seed=7):
    """Base gaussians + near-dups planted at exact cosine in [0.82, 0.95]:
    v' = cosθ·u + sinθ·w⊥ (w⊥ a random unit vector orthogonalized to u)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i]) for i in range(n_base)]
    truth = set()
    for j in range(n_dups):
        i = j % n_base
        u = base[i]
        target = rng.uniform(0.82, 0.95)
        w = rng.standard_normal(dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        v = target * u + np.sqrt(1 - target ** 2) * w
        rows.append((n_base + j, v))
        truth.add((i, n_base + j))
    return rows, truth


def test_embedding_dup_recall_banded(spark):
    """Banded LSH (12 bands × 6 planes, OR-amplified) recovers ≥0.9 of the
    planted cos≥0.82 pairs; a single full-signature table at the same
    plane budget per band (the pre-banding scheme) provably cannot —
    its expected recall is the one-band survival, ≈0.27."""
    rows, truth = _seeded_near_dup_embeddings()
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                        "embedding": [list(map(float, r[1])) for r in rows]})
    e = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    got = DD.embedding_dup_pairs(e, 0.80, dim=64).toPandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(got.id_a, got.id_b)}
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"banded recall {recall:.2f}"

    # the old single-table scheme, simulated in numpy: candidates must match
    # the FULL 6-bit signature of band 0 — same planes, no OR amplification
    W = DD.hyperplane_weights(6, 64)
    M = np.stack([r[1] for r in rows])
    vq = np.floor(M * 65536.0 + 0.5).astype(np.int64)
    bits = (vq @ W.T >= 0).astype(np.int64)
    sig = (bits * (1 << np.arange(6))).sum(1)
    old_found = {p for p in truth if sig[p[0]] == sig[p[1]]}
    old_recall = len(old_found) / len(truth)
    assert old_recall < 0.6, f"single-table recall unexpectedly {old_recall:.2f}"
    assert recall > old_recall


def test_cosine_topk_matches_numpy(spark, embeddings):
    e = embeddings.limit(200).cache()
    q = e.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
    got = SIM.cosine_topk(e, q, 5).toPandas()
    pdf = e.toPandas()
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    qpdf = q.toPandas()
    for r in qpdf.itertuples():
        qv = np.array(r.embedding, dtype=np.float64)
        cos = mat @ qv / (norms * np.linalg.norm(qv))
        cos_e6 = np.floor(cos * 1e6).astype(np.int64)
        order = sorted(range(len(pdf)),
                       key=lambda i: (-cos_e6[i], pdf.vec_id[i]))[:5]
        want = [pdf.vec_id[i] for i in order]
        sub = got[got.qid == r.qid].sort_values("rank")
        assert list(sub.nbr_id) == want, r.qid


def test_ivf_topk_recall(spark, embeddings):
    e = embeddings.cache()
    q = e.limit(20).select(F.col("vec_id").alias("qid"), "embedding")
    exact = SIM.cosine_topk(e, q, 10)
    approx = SIM.ivf_topk(e, q, 10, n_lists=8, nprobe=4)
    rec = SIM.recall_at_k(exact, approx, 10)
    assert rec >= 0.7, rec


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["i1", "i2"],
        "blob": [bytearray(MM.pack_fake_image(64, 48)),
                 bytearray(MM.pack_fake_image(128, 96))]}))
    meta = MM.decode_image_meta(media).toPandas().set_index("media_ref")
    assert (meta.loc["i1", "width"], meta.loc["i1", "height"]) == (64, 48)
    feats = MM.image_features(media, dim=16).toPandas()
    assert all(len(f) == 16 for f in feats.feature)
    resized = MM.resize_images(media, 32, 32).toPandas()
    assert (resized.width == 32).all()
    video = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["v1"], "blob": [bytearray(b"x" * 4096 * 25)]}))
    frames = MM.sample_video_frames(video, every_n=10).toPandas()
    assert list(frames.frame_idx) == [0, 10, 20]


def test_cosine_topk_query_guard(spark, embeddings):
    """The fast/exact flavors collect Q to the driver by contract — a
    corpus-scale query side must raise with a redirect to ivf_topk, not
    OOM the driver."""
    q = embeddings.select(F.col("vec_id").alias("qid"), "embedding")
    for fn in (SIM.cosine_topk_fast, SIM.cosine_topk_exact):
        with pytest.raises(ValueError, match="ivf_topk"):
            fn(embeddings, q, 5, max_query_rows=10)
    # under the cap the result is unchanged
    small = q.orderBy("qid").limit(4)
    got = SIM.cosine_topk_exact(embeddings.limit(100), small, 3,
                                max_query_rows=10)
    assert got.count() == 12


def test_cosine_topk_fast_matches_hof(spark, embeddings):
    e = embeddings.limit(300).cache()
    q = e.limit(8).select(F.col("vec_id").alias("qid"), "embedding")
    slow = SIM.cosine_topk(e, q, 5).toPandas()
    fast = SIM.cosine_topk_fast(e, q, 5).toPandas()
    s = {(str(r.qid), str(r.nbr_id), r.rank) for r in slow.itertuples()}
    f = {(str(r.qid), str(r.nbr_id), r.rank) for r in fast.itertuples()}
    assert s == f


def test_multimodal_real_tiff_decode_resize_features(spark):
    """TIFF payloads exercise the REAL codec path: metadata from the tag
    walk, nearest-neighbor resize through the in-repo writer (round-trip
    verified pixel-exact), and a genuine normalized intensity histogram
    feature."""
    from rasterkit_spark.io import tiffcodec as TC

    rng = np.random.default_rng(5)
    img1 = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    img2 = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    media = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["t1", "t2", "fake"],
        "blob": [bytearray(TC.write_tiff(img1)),
                 bytearray(TC.write_tiff(img2)),
                 bytearray(MM.pack_fake_image(10, 10))]}))

    meta = MM.decode_image_meta(media).toPandas().set_index("media_ref")
    assert (meta.loc["t1", "width"], meta.loc["t1", "height"]) == (64, 48)
    assert meta.loc["t1", "decode_ok"] == 1   # real decode
    assert meta.loc["fake", "decode_ok"] == 0  # fake-contract fallback

    rs = MM.resize_images(media, 32, 24).toPandas().set_index("media_ref")
    out = rs.loc["t1", "blob"]
    ifds, _, _ = TC.read_tiff(bytes(out))
    assert ifds[0].get(TC.TAG_WIDTH) == 32 and ifds[0].get(TC.TAG_HEIGHT) == 24
    # nearest-neighbor oracle, pixel-exact through the write/read round-trip
    iy = (np.arange(24) * 48) // 24
    ix = (np.arange(32) * 64) // 32
    want = img1[iy][:, ix]
    got = MM._try_tiff(bytes(out))[3]
    np.testing.assert_array_equal(got, want)

    feats = MM.image_features(media, dim=16).toPandas().set_index("media_ref")
    f1 = np.array(feats.loc["t1", "feature"])
    hist, _ = np.histogram(img1, bins=16, range=(0, 256))
    np.testing.assert_allclose(f1, hist / hist.sum(), rtol=1e-6)
    assert abs(f1.sum() - 1.0) < 1e-5


def test_multimodal_real_png_decode(spark):
    """PNG payloads exercise the stdlib pngcodec REAL path end-to-end:
    metadata, nearest-neighbor resize (PNG-in → PNG-out, pixel-exact),
    histogram features, and strict=True NOT raising (PNG is real now)."""
    from rasterkit_spark.io import pngcodec as PC

    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    rgb = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    media = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["g", "c"],
        "blob": [bytearray(PC.write_png(gray)),
                 bytearray(PC.write_png(rgb))]}))

    meta = (MM.decode_image_meta(media, strict=True)  # strict: no fake path
            .toPandas().set_index("media_ref"))
    assert (meta.loc["g", "width"], meta.loc["g", "height"],
            meta.loc["g", "channels"]) == (64, 48, 1)
    assert (meta.loc["c", "width"], meta.loc["c", "channels"]) == (30, 3)
    assert (meta.decode_ok == 1).all()

    rs = (MM.resize_images(media, 16, 12, strict=True)
          .toPandas().set_index("media_ref"))
    got, m = PC.read_png(bytes(rs.loc["c", "blob"]))
    assert (m["width"], m["height"], m["channels"]) == (16, 12, 3)
    iy = (np.arange(12) * 20) // 12
    ix = (np.arange(16) * 30) // 16
    np.testing.assert_array_equal(got, rgb[iy][:, ix])

    feats = MM.image_features(media, dim=16).toPandas().set_index("media_ref")
    hist, _ = np.histogram(gray, bins=16, range=(0, 256))
    np.testing.assert_allclose(np.array(feats.loc["g", "feature"]),
                               hist / hist.sum(), rtol=1e-6)


def test_simhash_udf_matches_column_spec(spark):
    """simhash64_udf (vectorized hot path) must be bit-identical to the
    simhash64 Column spec the SQL oracle replays — including empty text,
    repeated whitespace, and single-token docs."""
    texts = ["the quick brown fox", "", "   ", "one",
             "a a a b", "the quick brown fox jumps over the lazy dog",
             "x " * 50, "unicode тест 漢字 mixed"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [str(i) for i in range(len(texts))],
                      "text": texts}))
    spec = df.select("doc_id",
                     DD.simhash64(F.col("text")).alias("sig")).toPandas()
    fast = df.select("doc_id",
                     DD.simhash64_udf()(F.col("text")).alias("sig")).toPandas()
    merged = spec.merge(fast, on="doc_id", suffixes=("_spec", "_fast"))
    assert (merged.sig_spec == merged.sig_fast).all()


def test_cos_e6_seq_udf_matches_hof(spark):
    """cos_e6_seq_udf must reproduce floor(cosine_sim*1e6) bit-exactly —
    including the exact self-match (must be 1000000, the case a blocked
    matmul can floor to 999999)."""
    rng = np.random.default_rng(11)
    vecs = [rng.normal(size=64).astype(np.float64).tolist()
            for _ in range(40)]
    rows = []
    for i in range(40):
        j = (i * 7) % 40
        rows.append(("p%d" % i, vecs[i], vecs[j]))
    rows.append(("self", vecs[0], vecs[0]))  # exact self-match
    pdf = pd.DataFrame(rows, columns=["pid", "a", "b"])
    df = spark.createDataFrame(pdf)
    hof = df.select(
        "pid", F.floor(DD.cosine_sim(F.col("a"), F.col("b")) * 1e6)
        .cast("long").alias("c")).toPandas()
    fast = df.select(
        "pid", DD.cos_e6_seq_udf()(F.col("a").cast("array<double>"),
                                   F.col("b").cast("array<double>"))
        .alias("c")).toPandas()
    m = hof.merge(fast, on="pid", suffixes=("_h", "_f"))
    assert (m.c_h == m.c_f).all()
    assert int(m.loc[m.pid == "self", "c_h"].iloc[0]) == 1_000_000


def test_knn_join_rejects_out_of_frame(spark):
    from rasterkit_spark.operators import spatial as SP
    pts = spark.createDataFrame(
        pd.DataFrame({"id": ["a", "b", "c"],
                      "x": [0.1, 0.5, 2.5],   # 2.5 outside frame
                      "y": [0.2, 0.6, 0.3]}))
    qs = spark.createDataFrame(
        pd.DataFrame({"qid": ["q"], "x": [0.4], "y": [0.4]}))
    with pytest.raises(ValueError, match="does not contain"):
        SP.knn_join(pts, qs, 2, frame=(0.0, 1.0, 0.0, 1.0))
    # containing frame still works
    out = SP.knn_join(pts, qs, 2, frame=(0.0, 3.0, 0.0, 1.0)).toPandas()
    assert set(out.nbr_id) == {"b", "a"} or len(out) == 2


def test_cosine_topk_exact_matches_hof_bitwise(spark, embeddings):
    """cosine_topk_exact must reproduce the HOF cosine_topk rows exactly —
    same cos_e6 (boundary re-score), same tie-breaks, same id dtypes —
    including the self-match rows where matmul could floor 1e6 down."""
    e = embeddings
    q = e.limit(6).selectExpr("vec_id as qid", "embedding")
    slow = SIM.cosine_topk(e, q, 5).toPandas() \
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    fast = SIM.cosine_topk_exact(e, q, 5).toPandas() \
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(slow, fast, check_dtype=False)
    # self-matches rank 1 with cos_e6 exactly 1e6
    self_rows = fast[(fast.qid == fast.nbr_id)]
    assert len(self_rows) == 6
    assert (self_rows.cos_e6 == 1_000_000).all()
    assert (self_rows["rank"] == 1).all()


def test_topk_tie_storm_matches_hof(spark):
    """Adversarial mass-tie case: 64 identical vectors (all cos_e6 tie at
    1e6) plus a few distinct ones, k=3.  The per-batch partial top-k must
    keep the LOWEST ids among the tied candidates — a bounded superset
    from argpartition can admit arbitrary tie members and diverge from the
    HOF/oracle ROW_NUMBER (ORDER BY cos_e6 DESC, nbr_id) order."""
    rows = [{"vec_id": i, "embedding": [1.0, 2.0, 3.0]} for i in range(64)]
    rows += [{"vec_id": 100 + i, "embedding": [1.0, 2.0, 3.0 + i]}
             for i in range(1, 4)]
    e = spark.createDataFrame(pd.DataFrame(rows)).repartition(4)
    q = spark.createDataFrame(pd.DataFrame(
        [{"qid": 0, "embedding": [1.0, 2.0, 3.0]}]))
    want = SIM.cosine_topk(e, q, 3).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    assert want.nbr_id.tolist() == [0, 1, 2]
    for fn in (SIM.cosine_topk_exact,
               lambda *a, **k: SIM.ivf_topk(*a, n_lists=2, nprobe=2,
                                            sample_rows=64, **k)):
        got = fn(e, q, 3).toPandas().sort_values("rank") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(want, got, check_dtype=False)
    fast = SIM.cosine_topk_fast(e, q, 3).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    assert fast.nbr_id.astype(int).tolist() == [0, 1, 2]


def test_dedup_udfs_tolerate_null_text(spark):
    """NULL text rows must flow through minhash/simhash/jaccard like their
    Column-flavor specs (NULL shingles → row drops out; simhash sig 0) —
    the Arrow UDFs used to crash the stage on t.strip() of None."""
    rows = [{"doc_id": 1, "text": "alpha beta gamma delta"},
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "alpha beta gamma delta"}]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    mh = DD.minhash_lsh_pairs(docs, 0.8, n_hashes=16, bands=8).toPandas()
    assert set(zip(mh.id_a, mh.id_b)) == {(1, 3)}
    sh = DD.simhash_pairs(docs, max_hamming=3).toPandas()
    assert (1, 3) in set(zip(sh.id_a, sh.id_b))
    jc = DD.ngram_jaccard_pairs(docs, 0.8).toPandas()
    assert set(zip(jc.id_a, jc.id_b)) == {(1, 3)}


def test_minhash_bands_validation(spark):
    docs = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": 1, "text": "a b c"}]))
    with pytest.raises(ValueError, match="must divide"):
        DD.minhash_lsh_pairs(docs, 0.8, n_hashes=16, bands=32)
    with pytest.raises(ValueError, match="must divide"):
        DD.minhash_lsh_pairs(docs, 0.8, n_hashes=32, bands=10)


def test_zero_norm_vectors_handled(spark):
    """Zero-norm embeddings: cos_e6_seq_udf emits NULL (not int garbage),
    the matmul top-k flavors exclude the vector, and a zero-norm QUERY is
    a loud error."""
    rows = [{"vec_id": 0, "embedding": [0.0, 0.0, 0.0]},
            {"vec_id": 1, "embedding": [1.0, 2.0, 2.0]},
            {"vec_id": 2, "embedding": [2.0, 4.0, 4.0]},
            {"vec_id": 3, "embedding": [1.0, 0.0, 0.0]}]
    e = spark.createDataFrame(pd.DataFrame(rows))
    pairs = e.selectExpr("vec_id as id_a", "embedding as v_a").crossJoin(
        e.selectExpr("vec_id as id_b", "embedding as v_b"))
    scored = pairs.withColumn(
        "cos_e6", DD.cos_e6_seq_udf()(F.col("v_a").cast("array<double>"),
                                      F.col("v_b").cast("array<double>"))
    ).toPandas()
    zero_rows = scored[(scored.id_a == 0) | (scored.id_b == 0)]
    assert zero_rows.cos_e6.isna().all()
    assert scored[(scored.id_a == 1) & (scored.id_b == 2)
                  ].cos_e6.iloc[0] == 1_000_000
    q = spark.createDataFrame(pd.DataFrame(
        [{"qid": 9, "embedding": [1.0, 2.0, 2.0]}]))
    got = SIM.cosine_topk_exact(e, q, 4).toPandas()
    assert 0 not in set(got.nbr_id)          # excluded, not garbage-ranked
    assert len(got) == 3
    zq = spark.createDataFrame(pd.DataFrame(
        [{"qid": 8, "embedding": [0.0, 0.0, 0.0]}]))
    with pytest.raises(Exception, match="zero-norm"):
        SIM.cosine_topk_exact(e, zq, 2)


def test_lang_id_detects_unsegmented_zh(spark):
    """zh markers must count as bare substrings: unsegmented Chinese
    prose has no inter-word spaces, so the old space-delimited needles
    pinned score_zh to 0 and such docs fell to 'unknown'."""
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "我是学生的是了在都有"},
        {"doc_id": 2, "text": "the cat and the dog of a house"}]))
    got = TX.lang_id(docs).toPandas().set_index("doc_id")
    assert got.loc[1].lang_pred == "zh" and got.loc[1].score_zh > 0
    assert got.loc[2].lang_pred == "en"


def test_connected_components_chain_hub_singleton(spark):
    """Large-star/small-star CC: a 4-chain, a hub (one center, many leaves
    — the power-law dup shape), an isolated pair; labels = component min."""
    edges = [(2, 1), (2, 3), (4, 3)]          # chain 1-2-3-4
    hub = [(100, 100 + i) for i in range(1, 9)]
    pairs = spark.createDataFrame(edges + hub + [(10, 11)],
                                  "id_a long, id_b long")
    cc = DD.connected_components(pairs).toPandas().set_index("node")
    assert {cc.loc[i].component for i in (1, 2, 3, 4)} == {1}
    assert {cc.loc[i].component for i in range(100, 109)} == {100}
    assert cc.loc[10].component == 10 and cc.loc[11].component == 10


def test_dup_clusters_labels_and_sizes(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 10, 11, 20]}))
    pairs = spark.createDataFrame([(2, 1), (2, 3), (4, 3), (10, 11)],
                                  "id_a long, id_b long")
    got = DD.dup_clusters(docs, pairs).toPandas().set_index("doc_id")
    assert (got.loc[[1, 2, 3, 4]].cluster_id == 1).all()
    assert (got.loc[[1, 2, 3, 4]].cluster_size == 4).all()
    assert got.loc[20].cluster_id == 20 and got.loc[20].cluster_size == 1


def test_connected_components_empty_and_self_loop(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert DD.connected_components(empty).count() == 0
    loops = spark.createDataFrame([(5, 5), (6, 7)], "id_a long, id_b long")
    cc = DD.connected_components(loops).toPandas().set_index("node")
    assert 5 not in cc.index            # pure self-loop: no edge survives
    assert cc.loc[7].component == 6


def test_repetition_signals_flags_repetitive_doc(spark):
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "spam " * 19 + "spam"},       # one word 20x
        {"doc_id": 2, "text": "the quick brown fox jumps over a lazy dog "
                              "while rain falls on green hills today"},
    ]))
    got = TX.repetition_signals(docs).toPandas().set_index("doc_id")
    assert got.loc[1].top_word_frac_e6 == 1_000_000
    assert got.loc[1].dup_3gram_frac_e6 > 900_000
    assert got.loc[1].repetition_flag == 1
    assert got.loc[2].repetition_flag == 0
    # fractions bounded
    assert (got.top_2gram_chars_frac_e6 <= 1_000_000).all()


def test_shared_span_pairs_planted_substring(spark):
    """Two docs share an exact 60-char span inside different surroundings;
    a third doc is unrelated.  span length must be exact."""
    span = "the quick brown fox jumps over the lazy dog near a river"
    assert len(span) == 56
    # surroundings differ in the chars immediately adjacent to the span,
    # so the recovered max span is exactly the planted one
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "A" * 40 + span + "B" * 40},
        {"doc_id": 2, "text": "C" * 28 + span + "D" * 48},
        {"doc_id": 3, "text": "totally unrelated content without overlap "
                              * 4},
    ]))
    got = DD.shared_span_pairs(docs, min_len=40).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.max_span_len == len(span)
    assert r.n_anchors == len(span) - 40 + 1


def test_shared_span_pairs_short_docs_and_cap(spark):
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "too short"},
        {"doc_id": 2, "text": "also short"},
    ]))
    assert DD.shared_span_pairs(docs, min_len=40).count() == 0
    # hot-gram cap: a gram in 3 docs is dropped at max_gram_docs=2
    boiler = "b" * 50
    docs3 = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": i, "text": boiler} for i in (1, 2, 3)]))
    assert DD.shared_span_pairs(docs3, min_len=40).count() == 3
    assert DD.shared_span_pairs(docs3, min_len=40,
                                max_gram_docs=2).count() == 0


def test_contamination_check_known_overlap(spark):
    """doc 1 = 6 words → 4 distinct 3-grams, 2 of which sit inside the
    benchmark doc; doc 2 shares nothing."""
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "one two three four"},
    ]))
    benchmark = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 100, "text": "XX alpha beta gamma delta YY"},
    ]))
    got = DD.contamination_check(docs, benchmark, n=3) \
        .toPandas().set_index("doc_id")
    assert got.loc[1].n_grams == 4
    assert got.loc[1].n_hit == 2          # 'alpha beta gamma', 'beta gamma delta'
    assert got.loc[1].overlap_e6 == 500_000
    assert got.loc[2].n_hit == 0 and got.loc[2].overlap_e6 == 0


def test_connected_components_string_ids(spark):
    """Ids keep their native type: string doc ids must cluster, not be
    silently cast to NULL longs (which returned an empty result)."""
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c")], "id_a string, id_b string")
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["doc-a", "doc-b", "doc-c", "doc-z"]}))
    got = DD.dup_clusters(docs, pairs).toPandas().set_index("doc_id")
    assert got.loc["doc-a"].cluster_id == "doc-a"
    assert got.loc["doc-c"].cluster_id == "doc-a"
    assert got.loc["doc-c"].cluster_size == 3
    assert got.loc["doc-z"].cluster_size == 1


def test_repetition_flag_needs_min_length(spark):
    """A 1-word doc has top_word_frac 1.0 by construction — the flag must
    not fire below the minimum-length gate (the Gopher pairing)."""
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "hello"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "spam " * 19 + "spam"},   # long AND repetitive
    ]))
    got = TX.repetition_signals(docs).toPandas().set_index("doc_id")
    assert got.loc[1].top_word_frac_e6 == 1_000_000    # signal still reported
    assert got.loc[1].repetition_flag == 0             # but not flagged
    assert got.loc[2].repetition_flag == 0
    assert got.loc[3].repetition_flag == 1


def test_multimodal_malformed_jpeg_shaped_blob_no_crash(spark):
    """SOI+SOF0+SOS with no DHT/DQT (the MJPEG shape) must fall through to
    the fake path in non-strict mode, not kill the task with KeyError."""
    import struct as _struct
    sof = _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob = (b"\xFF\xD8"
            + b"\xFF\xC0" + _struct.pack(">H", 2 + len(sof)) + sof
            + b"\xFF\xDA" + _struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
            + b"\x12\x34" + b"\xFF\xD9")
    media = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["bad"], "blob": [bytearray(blob)]}))
    got = MM.decode_image_meta(media, strict=False).toPandas()
    assert got.iloc[0].decode_ok == 0                  # fake path, no crash


def test_corpus_stats_exact_percentiles(spark):
    from rasterkit_spark.operators import text as TX
    docs = spark.createDataFrame(pd.DataFrame([
        dict(doc_id=i, source="s0", text="w " * i + "w")    # lengths vary
        for i in range(1, 6)] + [
        dict(doc_id=10, source="s1", text="")]))
    got = TX.corpus_stats(docs).toPandas().set_index("source")
    assert got.loc["s0"].n_docs == 5
    assert got.loc["s0"].total_words == sum(i + 1 for i in range(1, 6))
    # lengths: 2i+1 chars for i=1..5 → [3,5,7,9,11]; p50 = 7
    assert got.loc["s0"].p50_chars_e6 == 7_000_000
    assert got.loc["s1"].total_words == 0


def test_pii_scrub_redaction_and_counts(spark):
    from rasterkit_spark.operators import text as TX
    docs = spark.createDataFrame(pd.DataFrame([
        dict(doc_id=1, text="mail a.b+c@x-mail.co.uk or b@y.io, "
                            "call +4915112345678, host 192.168.001.1 up"),
        dict(doc_id=2, text="clean text with no pii at all"),
        dict(doc_id=3, text="not an ip 1234.5.6.7890 and not a phone +12"),
    ]))
    got = TX.pii_scrub(docs).toPandas().set_index("doc_id")
    assert got.loc[1].n_emails == 2
    assert got.loc[1].n_phones == 1
    assert got.loc[1].n_ips == 1
    c = got.loc[1].clean_text
    assert "<EMAIL>" in c and "<PHONE>" in c and "<IP>" in c
    assert "@" not in c and "+4915" not in c and "192.168" not in c
    assert got.loc[2].clean_text == "clean text with no pii at all"
    assert (got.loc[2][["n_emails", "n_phones", "n_ips"]] == 0).all()
    # 1234.5.6.7890: the \b-bounded octet pattern must not fire inside
    # longer digit runs; +12 is below the 7-digit phone floor
    assert got.loc[3].n_ips == 0 and got.loc[3].n_phones == 0


def test_tfidf_keywords_ranking(spark):
    from rasterkit_spark.operators import text as TX
    import math
    docs = spark.createDataFrame(pd.DataFrame([
        dict(doc_id=1, text="apple apple banana common"),
        dict(doc_id=2, text="cherry common"),
        dict(doc_id=3, text="common plum plum plum"),
    ]))
    got = TX.tfidf_keywords(docs, k=2).toPandas()
    one = got[got.doc_id == 1].sort_values("rank")
    # apple: tf=2, df=1 → 2·ln(3); banana: 1·ln(3); common: 1·ln(1)=0
    assert list(one.term) == ["apple", "banana"]
    assert one.iloc[0].tfidf_e4 == int(math.floor(2 * math.log(3) * 1e4))
    # 'common' appears in every doc → idf 0: score exactly 0, and never
    # ranked above any distinguishing term (it can still fill out top-k
    # for docs with fewer than k distinctive terms, like doc 2)
    common = got[got.term == "common"]
    assert (common.tfidf_e4 == 0).all()
    assert (common["rank"] == 2).all()
    assert got.groupby("doc_id").size().max() <= 2



def test_minhash_incremental_index_probe(spark, documents):
    """Ingest-batch probe against a persisted index finds the planted
    near-dups and never re-signs the corpus side (only batch ids are
    signed — asserted via the index being reusable as a plain table)."""
    corpus = documents.limit(40)
    index = DD.build_minhash_index(corpus, n_hashes=32, bands=16,
                                   shingle_n=3, use_words=True)
    # persist/reload round-trip: the index is a plain (id, band, bsig)
    # table — exactly what a daily job reads back from storage
    pdf = index.toPandas()
    stored = spark.createDataFrame(pdf)
    new_docs = corpus.limit(10).selectExpr(
        "doc_id + 900000 as doc_id", "concat(text, ' tiny tail') as text")
    got = DD.minhash_pairs_against_index(
        new_docs, stored, corpus, 0.5, n_hashes=32, bands=16,
        shingle_n=3, use_words=True).toPandas()
    planted = {(i + 900000, i) for i in
               corpus.limit(10).toPandas().doc_id}
    found = set(zip(got.new_id, got.corpus_id))
    assert len(found & planted) >= 0.9 * len(planted)
    assert (got.jaccard_e6 >= 500_000).all()
    # every emitted pair is new × corpus, never corpus × corpus
    assert (got.new_id >= 900000).all() and (got.corpus_id < 900000).all()


def test_embedding_index_probe(spark, embeddings):
    """Ingest-batch probe against a stored embedding index recovers
    planted near-identical vectors with exact-cosine verification."""
    corpus = embeddings.limit(100)
    index = DD.build_embedding_index(corpus, dim=64)
    stored = spark.createDataFrame(index.toPandas())  # persist round-trip
    new_vecs = corpus.limit(10).selectExpr(
        "vec_id + 800000 as vec_id",
        # zero the first 4 of 64 dims: cos ~ 0.97 vs the original
        "concat(array(cast(0.0 as float), cast(0.0 as float), "
        "cast(0.0 as float), cast(0.0 as float)), slice(embedding, 5, 60))"
        " as embedding")
    got = DD.embedding_dups_against_index(
        new_vecs, stored, corpus, 0.8, dim=64).toPandas()
    planted = {(i + 800000, i) for i in corpus.limit(10).toPandas().vec_id}
    found = set(zip(got.new_id, got.corpus_id))
    assert len(found & planted) >= 0.9 * len(planted)
    assert (got.cos_e6 >= 800_000).all()
    assert (got.new_id >= 800000).all() and (got.corpus_id < 800000).all()


def test_tfidf_vocab_join_not_forced_broadcast(spark):
    """The df (vocabulary) join must NOT carry a forced broadcast hint: a
    web corpus's vocabulary is billions of terms, so the hint is an OOM
    at scale.  With auto-broadcast disabled the physical plan must show
    a shuffle join, proving the only broadcasts are AQE's own choices
    (VERDICT r4 item #6)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a d"]}))
        plan = TX.tfidf_keywords(docs, k=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
