"""Property tests for the round-4 operators: random inputs vs Python
brute-force oracles (one Spark job per example is too slow for Hypothesis'
default profile, so each property runs a handful of seeded random cases)."""

import numpy as np
import pandas as pd

from rasterkit_spark.operators import dedup as DD
from rasterkit_spark.operators import temporal as TP
from rasterkit_spark.operators import text as TX


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_random_graphs_match_union_find(spark):
    rng = np.random.default_rng(17)
    for trial in range(4):
        n = int(rng.integers(5, 60))
        m = int(rng.integers(1, 3 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        want = _uf_components(edges, nodes)
        got = DD.connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long")) \
            .toPandas().set_index("node")["component"].to_dict()
        assert got == want, f"trial {trial}: {got} != {want}"


def test_chunking_covers_every_word_exactly(spark):
    rng = np.random.default_rng(5)
    rows = [dict(doc_id=i, text=" ".join(
        f"t{i}_{j}" for j in range(int(rng.integers(1, 150)))))
        for i in range(12)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    cw, ov = 32, 8
    got = TX.chunk_documents(docs, chunk_words=cw, overlap=ov).toPandas()
    for r in rows:
        words = r["text"].split()
        chunks = got[got.doc_id == r["doc_id"]].sort_values("chunk_id")
        covered = set()
        stride = cw - ov
        for c in chunks.itertuples():
            cws = c.chunk_text.split()
            start = c.chunk_id * stride
            assert cws == words[start:start + cw]   # exact window content
            covered.update(range(start, start + len(cws)))
        assert covered == set(range(len(words)))    # complete, no gaps


def test_sessionize_partitions_events(spark):
    """Sessions partition each user's events: counts sum to the total and
    session durations never exceed the user's full time range."""
    from pyspark.sql import functions as F
    rng = np.random.default_rng(23)
    rows = []
    eid = 0
    for u in range(6):
        t = 0
        for _ in range(int(rng.integers(1, 40))):
            t += int(rng.integers(1, 4000))
            rows.append(dict(event_id=eid, user_id=u,
                             ts=pd.Timestamp("2024-01-01")
                             + pd.Timedelta(seconds=t)))
            eid += 1
    ev = spark.createDataFrame(pd.DataFrame(rows))
    got = TP.sessionize(ev, gap_sec=1800).toPandas()
    per_user = pd.DataFrame(rows).groupby("user_id").size()
    agg = got.groupby("user_id").n_events.sum()
    for u in per_user.index:
        assert agg[u] == per_user[u]
    # brute-force session count per user
    for u in range(6):
        ts = sorted(r["ts"].timestamp() for r in rows if r["user_id"] == u)
        want_sessions = 1 + sum(1 for a, b in zip(ts, ts[1:])
                                if b - a > 1800)
        assert len(got[got.user_id == u]) == want_sessions


def test_asof_join_matches_bruteforce(spark):
    rng = np.random.default_rng(31)
    lrows = [dict(event_id=i, user_id=int(rng.integers(0, 5)),
                  ts_sec=int(rng.integers(0, 300))) for i in range(60)]
    rrows = [dict(event_id=1000 + i, user_id=int(rng.integers(0, 5)),
                  ts_sec=int(rng.integers(0, 300))) for i in range(40)]
    got = TP.asof_join(
        spark.createDataFrame(pd.DataFrame(lrows)),
        spark.createDataFrame(pd.DataFrame(rrows)),
        "user_id", "ts_sec", ("event_id",)).toPandas().set_index("event_id")
    for l in lrows:
        cand = [r for r in rrows if r["user_id"] == l["user_id"]
                and r["ts_sec"] <= l["ts_sec"]]
        row = got.loc[l["event_id"]]
        if not cand:
            assert pd.isna(row.asof_event_id)
        else:
            best_ts = max(r["ts_sec"] for r in cand)
            best_id = max(r["event_id"] for r in cand
                          if r["ts_sec"] == best_ts)
            assert row.asof_ts_sec == best_ts
            assert row.asof_event_id == best_id


def _brute_dedup_blocks(rows, bw):
    blocks = []
    for r in rows:
        ws = r["text"].strip().split(" ")
        n = 1 + max(0, -(-(len(ws) - bw) // bw)) if len(ws) > bw else 1
        for i in range(n):
            blocks.append((r["doc_id"], i,
                           " ".join(ws[i * bw:i * bw + bw])))
    first = {}
    for d, i, t in sorted(blocks):
        first.setdefault(t, (d, i))
    out = {}
    for d, i, t in blocks:
        tot, kept = out.setdefault(d, [0, []])
        out[d][0] += 1
        if first[t] == (d, i):
            out[d][1].append((i, t))
    return {d: (tot, len(k), " ".join(t for _, t in sorted(k)))
            for d, (tot, k) in out.items()}


def test_dedup_blocks_matches_bruteforce_first_occurrence(spark):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(7)]  # tiny vocab → real collisions
    rows = [dict(doc_id=i, text=" ".join(
        vocab[int(j)] for j in rng.integers(0, 7, int(rng.integers(1, 40)))))
        for i in range(25)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    got = DD.dedup_blocks(docs, block_words=3).toPandas() \
        .set_index("doc_id")
    want = _brute_dedup_blocks(rows, 3)
    for d, (tot, kept, text) in want.items():
        row = got.loc[d]
        assert (row.n_blocks, row.n_kept, row.text_kept) == \
            (tot, kept, text), f"doc {d}"
    # non-vacuity: the tiny vocab must actually produce dropped blocks
    assert (got.n_kept < got.n_blocks).any()


def test_contamination_bloom_equals_exact_operator(spark):
    rng = np.random.default_rng(31)
    vocab = [f"v{i}" for i in range(12)]
    rows = [dict(doc_id=i, text=" ".join(
        vocab[int(j)] for j in rng.integers(0, 12, 30))) for i in range(40)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    train = docs.filter("doc_id % 5 != 0")
    bench = docs.filter("doc_id % 5 = 0")
    exact = DD.contamination_check(train, bench, n=3).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = DD.contamination_check_bloom(train, bench, n=3,
                                         m_bits=1 << 16).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, bloom)
    assert (exact.n_hit > 0).any()  # non-vacuous overlap


def test_pack_sequences_stream_is_contiguous_per_shard(spark):
    rng = np.random.default_rng(41)
    rows = [dict(doc_id=i, source=f"s{i % 3}", text=" ".join(
        "x" for _ in range(int(rng.integers(0, 300)))))
        for i in range(30)]
    # include one empty doc: occupies only its EOS slot
    rows[7]["text"] = ""
    docs = spark.createDataFrame(pd.DataFrame(rows))
    got = TX.pack_sequences(docs, seq_len=64, shard_col="source") \
        .toPandas().sort_values(["shard", "doc_id"])
    for shard, g in got.groupby("shard"):
        expect_start = 0
        for r in g.itertuples():
            assert r.start_tok == expect_start
            assert r.seq_first == r.start_tok // 64
            last = max(r.start_tok + r.n_tokens - 1, r.start_tok)
            assert r.seq_last == last // 64
            assert r.n_seqs == r.seq_last - r.seq_first + 1
            expect_start += r.n_tokens + 1  # +1 EOS separator


def test_pack_sequences_shard_buckets_identical_and_parallel(spark):
    """VERDICT r5 #6: shard_buckets=N must (a) return bit-identical rows
    to the single-window plan even for a ONE-shard corpus, and (b) run
    the big cumsum window partitioned by (shard, bucket) — no
    single-partition sort of the hot shard."""
    rng = np.random.default_rng(43)
    rows = [dict(doc_id=i, source="only_shard", text=" ".join(
        "w" for _ in range(int(rng.integers(0, 120)))))
        for i in range(200)]
    rows[11]["text"] = ""
    docs = spark.createDataFrame(pd.DataFrame(rows))
    base = TX.pack_sequences(docs, seq_len=64, shard_col="source") \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    bucketed_df = TX.pack_sequences(docs, seq_len=64, shard_col="source",
                                    shard_buckets=4)
    bucketed = bucketed_df.toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(base, bucketed)
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    # the heavy cumsum window is keyed by (shard, _b): its exchange must
    # hash-partition on both, never on the bare shard column
    assert "hashpartitioning(shard" in plan and "_b" in \
        plan.split("hashpartitioning(shard")[1][:80], plan[:2000]


def test_corpus_pipeline_matches_staged_composition(spark):
    """The composed plan must equal running the stages one by one."""
    from rasterkit_spark.operators.pipeline import corpus_pipeline
    from rasterkit_spark.operators import sampling as SMP

    rng = np.random.default_rng(53)
    stop = ["the", "a"]  # appear in STOPWORDS → varied stop_ratio
    vocab = [f"q{i}" for i in range(9)] + stop
    rows = []
    for i in range(60):
        n = int(rng.integers(3, 60))
        rows.append(dict(doc_id=i, source=f"s{i % 2}", text=" ".join(
            vocab[int(j)] for j in rng.integers(0, len(vocab), n))))
    rows[11]["text"] = rows[4]["text"]   # exact dup → dedup must drop 11
    docs_all = spark.createDataFrame(pd.DataFrame(rows))
    docs = docs_all.filter("doc_id % 7 != 0")
    bench = docs_all.filter("doc_id % 7 = 0")

    got = corpus_pipeline(
        docs, bench, min_quality=80, max_contamination_e6=900_000,
        rates_ppm={"s0": 1_000_000}, default_ppm=700_000,
        train_ppm=800_000, val_ppm=100_000, seq_len=32).toPandas()

    # staged replay with the operators directly
    q = TX.quality_score(docs, passthrough=("text", "source")) \
        .filter("quality_score >= 80")
    reps = DD.exact_dedup(q).selectExpr("rep_id AS doc_id")
    kept = q.join(reps, "doc_id", "left_semi")
    ov = DD.contamination_check(kept, bench, n=3) \
        .filter("overlap_e6 <= 900000").select("doc_id", "overlap_e6")
    kept = kept.join(ov, "doc_id")
    kept = SMP.stratified_sample(kept, {"s0": 1_000_000},
                                 default_ppm=700_000)
    kept = SMP.split_assign(kept, train_ppm=800_000, val_ppm=100_000)
    import pyspark.sql.functions as SF
    kept = kept.withColumn("shard", SF.concat_ws("/", "split", "source"))
    want = TX.pack_sequences(
        kept, 32, shard_col="shard",
        passthrough=("split", "quality_score", "overlap_e6")) \
        .select(*got.columns).toPandas()

    key = sorted(got.columns)
    gs = got[key].sort_values(key).reset_index(drop=True)
    ws = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(gs, ws)
    # non-vacuity: the dup is gone, several docs filtered, rows remain
    assert 11 not in set(gs.doc_id)
    assert 0 < len(gs) < len(rows)


def test_ivf_index_probe_matches_inline_ivf(spark):
    """ivf_topk_against_index over a stored index must equal ivf_topk
    run inline with the same centroids/params (the stored assignment is
    the same bit-identical integer-grid argmin)."""
    from rasterkit_spark.operators import similarity as SIM

    rng = np.random.default_rng(61)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(120),
                      "embedding": [v.tolist() for v in vecs]}))
    q = emb.filter("vec_id % 11 = 0").selectExpr("vec_id AS qid",
                                                 "embedding")
    inline = SIM.ivf_topk(emb, q, 4, n_lists=4, nprobe=2,
                          sample_rows=120).toPandas()
    cents = SIM.fit_centroids(emb, 4, sample_rows=120)
    index = SIM.build_ivf_index(emb, cents)
    probed = SIM.ivf_topk_against_index(q, index, cents, 4,
                                        nprobe=2).toPandas()
    key = ["qid", "rank"]
    a = inline.sort_values(key).reset_index(drop=True)
    b = probed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_contamination_bloom_saturated_filter_still_exact(spark):
    """Adversarial m_bits: a saturated Bloom bitmap (fp→1, prefilter
    passes nearly everything) must still produce the exact operator's
    output — correctness must never depend on the filter being
    selective."""
    rng = np.random.default_rng(71)
    vocab = [f"z{i}" for i in range(30)]
    rows = [dict(doc_id=i, text=" ".join(
        vocab[int(j)] for j in rng.integers(0, 30, 25))) for i in range(30)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    train = docs.filter("doc_id % 4 != 0")
    bench = docs.filter("doc_id % 4 = 0")
    exact = DD.contamination_check(train, bench, n=2).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # 1001 is deliberately NOT a multiple of 8: the bitmap must round up
    # to whole bytes or the last partial byte's indices go out of bounds
    bloom = DD.contamination_check_bloom(train, bench, n=2,
                                         m_bits=1001, k=4).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, bloom)


def test_materialize_sequences_equals_bruteforce_packer(spark):
    """The packed sequences must equal concat-docs-with-EOS-then-cut
    computed in plain Python per shard."""
    rng = np.random.default_rng(83)
    rows = [dict(doc_id=i, source=f"s{i % 2}", text=" ".join(
        f"t{i}x{j}" for j in range(int(rng.integers(0, 40)))))
        for i in range(40)]
    rows[5]["text"] = ""  # empty doc contributes only its EOS slot
    docs = spark.createDataFrame(pd.DataFrame(rows))
    L = 16
    got = TX.materialize_sequences(docs, seq_len=L, eos="</s>") \
        .toPandas().set_index(["shard", "seq_id"]).sort_index()

    want = {}
    for shard in ("s0", "s1"):
        stream = []
        for r in sorted((r for r in rows if r["source"] == shard),
                        key=lambda r: r["doc_id"]):
            words = r["text"].split() if r["text"].strip() else []
            stream += words + ["</s>"]
        for s in range(0, (len(stream) + L - 1) // L):
            chunk = stream[s * L:(s + 1) * L]
            want[(shard, s)] = (" ".join(chunk), len(chunk))

    assert set(got.index) == set(want)
    for key, (text, n) in want.items():
        assert got.loc[key, "seq_text"] == text, key
        assert got.loc[key, "n_tokens"] == n, key
    # all but each shard's final sequence are exactly full
    for shard in ("s0", "s1"):
        seqs = sorted(k[1] for k in want if k[0] == shard)
        for s in seqs[:-1]:
            assert want[(shard, s)][1] == L


def test_dedup_blocks_random_block_sizes(spark):
    """dedup_blocks equals brute force across several block sizes and a
    second vocab shape (multi-size regression for the slice/ceil
    arithmetic)."""
    rng = np.random.default_rng(97)
    vocab = [f"b{i}" for i in range(5)]
    rows = [dict(doc_id=i, text=" ".join(
        vocab[int(j)] for j in rng.integers(0, 5, int(rng.integers(1, 23)))))
        for i in range(18)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    for bw in (2, 5, 7):
        got = DD.dedup_blocks(docs, block_words=bw).toPandas() \
            .set_index("doc_id")
        want = _brute_dedup_blocks(rows, bw)
        for d, (tot, kept, text) in want.items():
            row = got.loc[d]
            assert (row.n_blocks, row.n_kept, row.text_kept) == \
                (tot, kept, text), f"bw={bw} doc={d}"


def test_pack_and_materialize_conserve_tokens(spark):
    """Conservation invariants tying the index op to the writer op:
    per shard, materialized sequence tokens sum to Σ(doc tokens + 1 EOS),
    and the index's max seq_last equals the writer's max seq_id."""
    rng = np.random.default_rng(101)
    rows = [dict(doc_id=i, source=f"s{i % 2}", text=" ".join(
        "w" for _ in range(int(rng.integers(0, 90)))))
        for i in range(24)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    L = 32
    idx = TX.pack_sequences(docs, seq_len=L).toPandas()
    mat = TX.materialize_sequences(docs, seq_len=L).toPandas()
    for shard, g in idx.groupby("shard"):
        slot_tokens = int((g.n_tokens + 1).sum())
        m = mat[mat.shard == shard]
        assert int(m.n_tokens.sum()) == slot_tokens
        # the EOS slot may spill one sequence past the index's seq_last
        # (seq_last covers only the doc BODY) — never more
        assert int(g.seq_last.max()) <= int(m.seq_id.max()) \
            <= int(g.seq_last.max()) + 1
        # every non-final sequence is exactly full
        full = m.sort_values("seq_id").iloc[:-1]
        assert (full.n_tokens == L).all()
