from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.functions import textfns as T
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_lang_id_discriminates_real_languages(spark):
    cases = {
        "the cat sat on the mat and it is happy": "en",
        "el perro corre en la calle y es feliz": "es",
        "le chien est dans la maison et il est heureux": "fr",
        "der hund ist in das haus und er ist nicht allein": "de",
        "这是一个中文句子": "zh",
    }
    for text, expected in cases.items():
        assert _one(spark, text, T.lang_id("text")) == expected


def test_shingles(spark):
    v = _one(spark, "a b c d", T.shingles("text", 3))
    assert sorted(v) == ["a b c", "b c d"]
    assert _one(spark, "a b", T.shingles("text", 3)) == []


def test_kr_hash_deterministic_and_python_parity(spark):
    s = "hello world"
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % ((1 << 31) - 1)
    assert _one(spark, s, T.kr_hash(T.normalize("text"))) == h


def test_quality_score_range(spark, sf_dir):
    rows = tp.text_quality(spark, sf_dir).collect()
    assert all(0.0 <= r.quality_score <= 1.0 for r in rows)
    assert all(r.n_words > 0 for r in rows)


def test_token_count_tiny(spark):
    df = spark.createDataFrame([(0, "Hello, world 42 times!")],
                               "doc_id bigint, text string")
    orig = tp.load_table
    try:
        tp.load_table = lambda s, n, d=None: df if n == "documents" else orig(s, n, d)
        r = tp.token_count(spark, "unused").collect()[0]
    finally:
        tp.load_table = orig
    assert r.ws_tokens == 4
    # hello | , | world | 42 | times | !  -> 6 bpe-ish tokens
    assert r.bpe_tokens == 6


def test_multimodal_decode_stub(spark, sf_dir):
    out = tp.multimodal_meta(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r.n_bytes > 0 and r.width >= 64 and r.height >= 64 for r in rows)
    assert out.columns == ["doc_id", "media_type", "n_bytes", "width",
                           "height", "n_channels", "mean_luma", "checksum",
                           "decoded"]
    # text payloads are not decodable images -> all fall back, declared
    assert all(not r.decoded for r in rows)


def test_doc_chunking_overlap(spark, sf_dir):
    rows = tp.doc_chunking(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, chunks in list(by_doc.items())[:20]:
        chunks = sorted(chunks, key=lambda r: r.chunk_idx)
        assert chunks[0].chunk_idx == 0
        assert all(c.n_tokens <= 50 for c in chunks)
        if len(chunks) > 1:
            # 50-word chunk every 40 words -> 10-word overlap
            w0 = chunks[0].chunk_text.split(" ")
            w1 = chunks[1].chunk_text.split(" ")
            assert w0[40:50] == w1[0:10]


def test_train_test_split_ratio(spark, sf_dir):
    rows = tp.train_test_split(spark, sf_dir).collect()
    n_train = sum(1 for r in rows if r.split == "train")
    assert 0.6 <= n_train / len(rows) <= 0.95  # hash split ~80%
    assert all(0 <= r.bucket < 100 for r in rows)


def test_tfidf_rare_terms_score_higher(spark, sf_dir):
    rows = tp.tfidf_topterms(spark, sf_dir).collect()
    assert all(r.rank <= 3 for r in rows)
    assert len({r.doc_id for r in rows}) == 500


def test_property_jaccard_and_krhash(spark):
    """Property tests (hypothesis): jaccard bounds/symmetry and
    KR-hash python parity on arbitrary ASCII strings."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                   min_size=0, max_size=80))
    def check(s):
        # python-side KR reference
        norm = " ".join(s.lower().split())
        h = 0
        for ch in norm:
            h = (h * 31 + ord(ch)) % ((1 << 31) - 1)
        df = spark.createDataFrame([(s,)], "text string")
        got = df.select(T.kr_hash(T.normalize("text")).alias("v")).collect()[0].v
        assert got == h

    check()


def test_property_jaccard_symmetry(spark):
    from hypothesis import given, settings, strategies as st
    words = st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]),
                     min_size=0, max_size=10)

    @settings(max_examples=15, deadline=None)
    @given(words, words)
    def check(wa, wb):
        df = spark.createDataFrame([(wa, wb)], "a array<string>, b array<string>")
        r = df.select(T.jaccard(F.col("a"), F.col("b")).alias("ab"),
                      T.jaccard(F.col("b"), F.col("a")).alias("ba")).collect()[0]
        assert r.ab == r.ba
        assert 0.0 <= r.ab <= 1.0
        if set(wa) == set(wb) and wa:
            assert r.ab == 1.0

    check()


def test_vocab_topk_plan_uses_take_ordered(spark, sf_dir):
    """C18 scale guard: the corpus-wide top-k must plan as
    TakeOrderedAndProject (per-partition local top-k + driver merge),
    never a global single-partition sort/Window over the full
    distinct-token table."""
    df = tp.vocab_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 100
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == \
        list(range(1, len(rows) + 1))
    freqs = [r.freq for r in sorted(rows, key=lambda r: r.rank)]
    assert freqs == sorted(freqs, reverse=True)


def test_dedup_corpus_drops_only_noncanonical(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.dedup import minhash_lsh_pairs
    from gcp_data_engineering_workshop_spark.operators.graph import connected_components

    docs = load_table(spark, "documents", sf_dir)
    kept = {r.doc_id for r in tp.dedup_corpus(spark, sf_dir).collect()}
    comp = connected_components(minhash_lsh_pairs(docs, tau=0.9)).collect()
    dropped = {r.doc_id for r in comp if r.doc_id != r.component}
    canonical = {r.component for r in comp}
    assert kept.isdisjoint(dropped)
    assert canonical <= kept
    assert len(kept) == docs.count() - len(dropped)


def test_sample_corpus_plan_and_determinism(spark, sf_dir):
    df = tp.sample_corpus(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    a = [r.doc_id for r in df.collect()]
    b = [r.doc_id for r in tp.sample_corpus(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_bigram_pmi_favors_collocations(spark, sf_dir):
    rows = tp.bigram_pmi(spark, sf_dir).collect()
    assert len(rows) > 0
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r.c12 >= 5 for r in rows)


def test_gopher_repetition_invariants(spark, sf_dir):
    rows = tp.gopher_repetition(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.dup_word_frac < 1.0
        assert 0.0 < r.top_word_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        if r.keep:
            assert (r.n_words >= 20 and r.dup_word_frac <= 0.55
                    and r.top_word_frac <= 0.15 and r.top_bigram_frac <= 0.10)
    # the thresholds must actually split this corpus, not rubber-stamp it
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_gopher_repetition_tiny_known_values(spark, sf_dir):
    """'a a a b' -> dup 0.5 (2 dup words), top word 0.75, top bigram
    'a a' 2/3."""
    from pyspark.sql import functions as F
    d = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    w = d.select("doc_id", T.words("text").alias("w"))
    base = w.select(F.size("w").alias("n"),
                    F.size(F.array_distinct("w")).alias("d")).collect()[0]
    assert base.n == 4 and base.d == 2


def test_decontaminate_semantics(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.plans.textpipeline import _docs
    rows = tp.decontaminate(spark, sf_dir).collect()
    n_train = _docs(spark, sf_dir).where(F.col("doc_id") % 97 != 0).count()
    assert len(rows) == n_train
    assert all(r.doc_id % 97 != 0 for r in rows)          # eval set excluded
    assert all((r.n_shared > 0) == r.contaminated for r in rows)
    # this word-soup corpus shares shingles heavily: some contamination
    # must be detected, but never universal n_shared=0
    assert any(r.contaminated for r in rows)


def test_binaryfile_feeds_multimodal_decode(spark, tmp_path):
    """E10 -> C12 end-to-end: blobs ingested via the binaryFile
    source flow straight into the Arrow-batched decode plumbing —
    the real multimodal ingestion topology (files -> binary column +
    typed metadata -> mapInPandas features), codec stubbed."""
    import os
    from gcp_data_engineering_workshop_spark.sources.formats import (
        read_binary_files)
    from gcp_data_engineering_workshop_spark.operators.multimodal import (
        decode_stub, _fake_decode)
    d = tmp_path / "media"; os.makedirs(d)
    payloads = {i: bytes([i] * (50 + i)) for i in range(3)}
    for i, b in payloads.items():
        (d / f"{i}.img").write_bytes(b)
    blobs = read_binary_files(spark, str(d), glob="*.img")
    media = blobs.select(
        F.element_at(F.split(F.element_at(F.split("path", "/"), -1), "\\."),
                     1).cast("bigint").alias("doc_id"),
        F.struct(F.lit("image/fake").alias("media_type"),
                 F.col("content").alias("payload"),
                 F.col("length").alias("n_chars"),
                 F.lit("binaryFile").alias("origin")).alias("media"))
    out = {r.doc_id: r for r in decode_stub(media).collect()}
    assert set(out) == {0, 1, 2}
    for i, b in payloads.items():
        w, h, c = _fake_decode(b)
        assert (out[i].width, out[i].height, out[i].checksum) == (w, h, c)
        assert out[i].n_bytes == len(b)


def test_temperature_sample_mixture_invariants(spark, sf_dir):
    """C33: targets are floor(sqrt(n_g * n_min)) — the minority
    language keeps everything, every other language is downsampled
    toward the geometric mean with the minority, and selection is
    the deterministic content-hash rank prefix (re-run identical)."""
    import math
    docs = tp._docs(spark, sf_dir)
    n_by_lang = {r.lang: r.c for r in
                 docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    n_min = min(n_by_lang.values())
    out = tp.temperature_sample(spark, sf_dir)
    got = {r.lang: r.c for r in
           out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, n_g in n_by_lang.items():
        assert got[lang] == math.floor(math.sqrt(n_g * n_min))
    min_lang = min(n_by_lang, key=n_by_lang.get)
    assert got[min_lang] == n_by_lang[min_lang]  # binding stratum: keep all
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, tp.temperature_sample(spark, sf_dir).collect()))
    assert a == b


def test_pack_sequences_greedy_invariants(spark, sf_dir):
    """C34: within every (bucket, pack) the token sum fits the
    budget unless the pack is a single over-long doc; slots are
    dense from 0; every doc appears exactly once; and the fold is
    genuinely greedy — no pack could have absorbed the FIRST doc of
    the next pack (the defining first-fit property)."""
    budget = 128
    out = tp.pack_sequences(spark, sf_dir, budget=budget).collect()
    n_docs = tp._docs(spark, sf_dir).count()
    assert len(out) == n_docs and len({r.doc_id for r in out}) == n_docs
    from collections import defaultdict
    packs = defaultdict(list)
    for r in out:
        packs[(r.bucket, r.pack_id)].append(r)
    for (bucket, pid), rows in packs.items():
        rows.sort(key=lambda r: r.slot)
        assert [r.slot for r in rows] == list(range(len(rows)))
        total = sum(r.n_tokens for r in rows)
        assert total <= budget or len(rows) == 1
        nxt = packs.get((bucket, pid + 1))
        if nxt:
            first_next = min(nxt, key=lambda r: r.slot)
            assert total + first_next.n_tokens > budget


def test_assign_ids_dense_rank_no_global_sort(spark, sf_dir):
    """C35: IDs are exactly 1..N in (content-hash, doc_id) order —
    dense, deterministic across re-runs — and the plan contains NO
    single-partition exchange: the global rank comes from range
    partitions + local ranks + offsets, never from funneling the
    table through one task."""
    out_df = tp.assign_ids(spark, sf_dir)
    out = out_df.collect()
    n = tp._docs(spark, sf_dir).count()
    ids = sorted(r.global_id for r in out)
    assert ids == list(range(1, n + 1))
    assert all(r.shard == (r.global_id - 1) % 16 for r in out)
    again = {r.doc_id: r.global_id for r in tp.assign_ids(spark, sf_dir).collect()}
    assert {r.doc_id: r.global_id for r in out} == again
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_domain_cap_invariants(spark, sf_dir):
    """C36: no source exceeds the cap, totals are the true
    per-source counts, clipped flags exactly the sources whose
    total exceeded the cap, and selection is the hash-rank prefix
    (deterministic re-run)."""
    cap = 7
    out = tp.domain_cap(spark, sf_dir, cap=cap).collect()
    truth = {r.source: r.c for r in
             tp._docs(spark, sf_dir).groupBy("source")
               .agg(F.count("*").alias("c")).collect()}
    from collections import Counter
    kept = Counter(r.source for r in out)
    for src, n in truth.items():
        assert kept[src] == min(n, cap)
    for r in out:
        assert r.src_total == truth[r.source]
        assert r.clipped == (truth[r.source] > cap)
        assert 1 <= r.src_rank <= cap
    again = sorted(map(tuple, tp.domain_cap(spark, sf_dir, cap=cap).collect()))
    assert sorted(map(tuple, out)) == again


def test_heavy_hitters_stream_scale_equals_batch(spark, sf_dir):
    """C37: bounded local-top-k candidate generation reproduces the
    full DISTINCT-candidate result of C31 exactly, while the
    candidate set stays bounded by k_local x partitions."""
    batch = [(r.token, r.est_count)
             for r in tp.heavy_hitters_cms(spark, sf_dir).collect()]
    stream = [(r.token, r.est_count)
              for r in tp.heavy_hitters_stream_scale(spark, sf_dir).collect()]
    assert stream == batch and len(batch) > 0
    from gcp_data_engineering_workshop_spark.operators import sketch as SK
    toks = tp._docs(spark, sf_dir).select(
        F.explode(T.words("text")).alias("token"))
    n_parts = toks.rdd.getNumPartitions()
    cand = SK.cm_local_topk_candidates(toks, "token", k_local=200)
    assert cand.count() <= 200 * n_parts


def test_line_dedup_removes_cross_doc_boilerplate(spark, sf_dir, tmp_path):
    """Hand-built corpus: a shared 5-word 'footer' chunk must vanish
    from every doc while unique chunks survive in order."""
    import os
    from gcp_data_engineering_workshop_spark.plans.textpipeline import line_dedup

    footer = "copyright acme corp all rights"
    docs = [
        (1, f"alpha beta gamma delta epsilon {footer}", "en", "s", 0),
        (2, f"one two three four five {footer}", "en", "s", 0),
        (3, "unique words only in here live", "en", "s", 0),
        (4, "tiny doc", "en", "s", 0),  # < 5 words: zero segments
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    d = str(tmp_path / "docs_sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in line_dedup(spark, d).collect()}
    assert out[1].cleaned_text == "alpha beta gamma delta epsilon"
    assert out[1].n_segs == 2 and out[1].n_dropped == 1
    assert out[2].cleaned_text == "one two three four five"
    assert out[3].cleaned_text == "unique words only in here"
    assert out[3].n_dropped == 0
    assert out[4].n_segs == 0 and out[4].cleaned_text == ""


def test_span_dedup_stats_hand_corpus(spark, tmp_path):
    """Two docs share a 10-word span; a third repeats a span inside
    itself; a fourth is unique. Coverage math is hand-checked."""
    import os
    from gcp_data_engineering_workshop_spark.plans.textpipeline import span_dedup_stats

    shared = "a b c d e f g h i j"           # 10 words
    docs = [
        (1, shared + " k l m", "en", "s", 0),           # 13 words, span 0 dup
        (2, "z y " + shared, "en", "s", 0),             # 12 words, span 2 dup
        (3, shared + " " + shared, "en", "s", 0),       # 20 words, self-repeat
        (4, "q w e r t y u i o p unique tail", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    d = str(tmp_path / "docs_sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in span_dedup_stats(spark, d).collect()}
    # doc 1: spans at 0..3; only span 0 == shared is duplicated
    # (doc 2 ends with it, doc 3 contains it) -> covers pos 0-9
    assert out[1].n_spans == 4 and out[1].n_dup_spans == 1
    assert out[1].covered_positions == 10
    assert abs(out[1].dup_fraction - 10 / 13) < 1e-12
    # doc 2: dup span starts at 2 -> covers 2-11 of 12 words
    assert out[2].covered_positions == 10
    # doc 3: 'shared shared' = 20 words, 11 spans; span 0 and span 10
    # equal `shared` (occ >= 2 globally); intermediate wrap spans are
    # unique. Coverage = [0,9] + [10,19] = all 20 positions
    assert out[3].n_spans == 11
    assert out[3].covered_positions == 20 and out[3].dup_fraction == 1.0
    # doc 4: 12 words, 3 spans, nothing duplicated
    assert out[4].n_dup_spans == 0 and out[4].dup_fraction == 0.0


def test_span_dedup_apply_hand_corpus(spark, tmp_path):
    """The removal half of the Lee et al. substring pipeline on the
    same hand corpus as the stats test: covered words vanish from the
    cleaned text, intervals merge, unique docs survive untouched."""
    import os
    from gcp_data_engineering_workshop_spark.plans.textpipeline import (
        span_dedup_apply)

    shared = "a b c d e f g h i j"           # 10 words
    docs = [
        (1, shared + " k l m", "en", "s", 0),           # dup covers 0-9
        (2, "z y " + shared, "en", "s", 0),             # dup covers 2-11
        (3, shared + " " + shared, "en", "s", 0),       # fully covered
        (4, "q w e r t y u i o p unique tail", "en", "s", 0),
        (5, "tiny doc", "en", "s", 0),                  # < 10 words
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    d = str(tmp_path / "docs_sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in span_dedup_apply(spark, d).collect()}
    assert out[1].cleaned_text == "k l m"
    assert out[1].n_removed_words == 10 and out[1].n_spans_removed == 1
    assert out[2].cleaned_text == "z y"
    assert out[2].n_removed_words == 10 and out[2].n_spans_removed == 1
    # doc 3: spans 0 and 10 are both duplicated; their coverage
    # [0,9] + [10,19] merges into ONE removed interval of 20 words
    assert out[3].cleaned_text == ""
    assert out[3].n_removed_words == 20 and out[3].n_spans_removed == 1
    assert out[4].cleaned_text == "q w e r t y u i o p unique tail"
    assert out[4].n_removed_words == 0 and out[4].n_spans_removed == 0
    assert out[5].cleaned_text == "tiny doc"
    assert out[5].n_words == 2


def test_tokenize_ids_roundtrip_and_oov(spark, sf_dir):
    """Ids 1..k map back to exactly the vocab tokens; id 0 tokens are
    exactly the out-of-vocab ones; every word position is covered."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.functions import textfns as T
    from gcp_data_engineering_workshop_spark.plans.textpipeline import (
        tokenize_ids, vocab_topk)

    ids = tokenize_ids(spark, sf_dir)
    d = load_table(spark, "documents", sf_dir)
    total_positions = d.select(
        F.explode(T.words("text")).alias("t")).count()
    assert ids.count() == total_positions
    vocab = {r.token: r.rank for r in vocab_topk(spark, sf_dir).collect()}
    toks = (d.select("doc_id", F.posexplode(T.words("text"))
                     .alias("pos", "token")))
    joined = toks.join(ids, ["doc_id", "pos"]).collect()
    for r in joined[:2000]:
        assert r.token_id == vocab.get(r.token, 0), r


def test_mixture_schedule_stride_properties(spark, sf_dir):
    """Stride scheduling invariants: per-source positions are the
    exact closed form (k-0.5)/w, and every prefix of the global
    order honors the weight mixture to within one doc per source."""
    from gcp_data_engineering_workshop_spark.plans.textpipeline import mixture_schedule

    rows = mixture_schedule(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    weights = {}
    for s, rs in by_src.items():
        rs.sort(key=lambda r: r.src_rank)
        assert [r.src_rank for r in rs] == list(range(1, len(rs) + 1)), s
        # recover w from the first position and check the closed form
        w = 0.5 / rs[0].position
        weights[s] = w
        for r in rs:
            assert abs(r.position - (r.src_rank - 0.5) / w) < 1e-9, s
    total_w = sum(weights.values())
    ordered = sorted(rows, key=lambda r: (r.position, r.doc_id))
    n_prefix = len(ordered) // 3
    prefix = ordered[:n_prefix]
    horizon = prefix[-1].position
    from collections import Counter
    got = Counter(r.source for r in prefix)
    for s, w in weights.items():
        # stride scheduling emits floor/ceil(horizon * w) docs of s
        # by any position horizon
        expect = horizon * w
        assert abs(got[s] - expect) <= 1.0, (s, got[s], expect)


def test_parse_image_headers_real_containers():
    """Hand-built minimal PNG/GIF/BMP/JPEG byte streams parse to
    their true dimensions — no codec library involved."""
    import struct
    from gcp_data_engineering_workshop_spark.operators.multimodal import (
        parse_image_header)

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    assert parse_image_header(png) == ("image/png", 640, 480)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == ("image/gif", 320, 200)

    bmp = (b"BM" + b"\x00" * 16
           + struct.pack("<ii", 800, -600) + b"\x00" * 4)
    assert parse_image_header(bmp) == ("image/bmp", 800, 600)

    # JPEG: SOI, APP0 segment, SOF0 with (h=1080, w=1920)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 9)
    assert parse_image_header(b"\xff\xd8" + app0 + sof0) \
        == ("image/jpeg", 1920, 1080)

    assert parse_image_header(b"plain text bytes") is None


def test_decode_uses_real_headers_in_batch(spark):
    """A mixed Arrow batch: recognized containers report true
    dimensions and sniffed types; unknown payloads fall back to the
    deterministic fake."""
    import struct
    from gcp_data_engineering_workshop_spark.operators import multimodal as MM

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 64, 32) + b"\x08\x02\x00\x00\x00")
    rows = [(1, {"media_type": "application/octet-stream",
                 "payload": bytearray(png), "n_chars": 0, "origin": "s"}),
            (2, {"media_type": "image/fake",
                 "payload": bytearray(b"not an image"), "n_chars": 0,
                 "origin": "s"})]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint, origin string>")
    out = {r.doc_id: r for r in MM.decode_stub(media).collect()}
    assert (out[1].media_type, out[1].width, out[1].height) \
        == ("image/png", 64, 32)
    assert out[2].media_type == "image/fake" and out[2].width >= 64


def test_bigram_lm_separates_predictable_from_shuffled(spark, tmp_path):
    """A corpus of one repeated phrasing plus one scrambled doc: the
    in-distribution docs must out-score the scrambled one (its
    bigrams are unseen elsewhere, so they take smoothed-floor
    probability)."""
    import os
    from gcp_data_engineering_workshop_spark.plans.textpipeline import bigram_lm_score

    phrase = "the quick brown fox jumps over the lazy dog"
    docs = [(i, phrase, "en", "s", 0) for i in range(1, 9)]
    docs.append((9, "dog the over quick lazy jumps fox brown the", "en", "s", 0))
    docs.append((10, "solo", "en", "s", 0))  # < 2 words: zero bigrams
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    d = str(tmp_path / "docs_sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in bigram_lm_score(spark, d).collect()}
    assert out[1].avg_logp > out[9].avg_logp
    assert all(out[i].avg_logp == out[1].avg_logp for i in range(2, 9))
    assert out[10].n_bigrams == 0 and out[10].avg_logp == 0.0


def test_span_dedup_keep_first_hand_corpus(spark, tmp_path):
    """Keep-one-copy semantics: the lowest-(doc_id, pos) occurrence
    of each duplicated span survives; later occurrences are removed."""
    import os
    from gcp_data_engineering_workshop_spark.plans.textpipeline import (
        span_dedup_keep_first)

    shared = "a b c d e f g h i j"           # 10 words
    docs = [
        (1, shared + " k l m", "en", "s", 0),     # FIRST occurrence: kept
        (2, "z y " + shared, "en", "s", 0),       # later: removed
        (3, shared + " " + shared, "en", "s", 0),  # pos-0 copy removed too
        (4, "q w e r t y u i o p unique tail", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    d = str(tmp_path / "docs_sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in span_dedup_keep_first(spark, d).collect()}
    # doc 1 holds the first occurrence -> nothing removed
    assert out[1].cleaned_text == shared + " k l m"
    assert out[1].n_removed_words == 0
    # doc 2's occurrence is later -> its copy goes
    assert out[2].cleaned_text == "z y"
    assert out[2].n_removed_words == 10 and out[2].n_spans_removed == 1
    # doc 3: both its `shared` spans are later occurrences; the wrap
    # spans (j a b...) are unique -> exactly positions 0-9 and 10-19
    # covered, merged into one interval
    assert out[3].cleaned_text == ""
    assert out[3].n_removed_words == 20 and out[3].n_spans_removed == 1
    assert out[4].n_removed_words == 0


def test_embed_docs_unit_norm_and_determinism(spark, sf_dir):
    """C64: embeddings are unit-norm (6dp), deterministic across
    runs, and sensitive to content (distinct docs rarely collide)."""
    rows = {r.doc_id: tuple(r.embedding)
            for r in tp.embed_docs_vec(spark, sf_dir).collect()}
    import math
    for v in list(rows.values())[:50]:
        n = math.sqrt(sum(x * x for x in v))
        assert abs(n - 1.0) < 1e-3 or n == 0.0
    again = {r.doc_id: tuple(r.embedding)
             for r in tp.embed_docs_vec(spark, sf_dir).collect()}
    assert rows == again
    assert len(set(rows.values())) > 0.9 * len(rows)


def test_embed_docs_flat_matches_vec(spark, sf_dir):
    """C64 driver entry: the flat exploded rows carry exactly the
    vector components, 64 per doc, and use only scalar columns (the
    driver-canonicalizer contract that r5's array output violated)."""
    from pyspark.sql import types as ST
    vec = {r.doc_id: list(r.embedding)
           for r in tp.embed_docs_vec(spark, sf_dir).collect()}
    flat = tp.embed_docs(spark, sf_dir)
    for f in flat.schema.fields:
        assert not isinstance(
            f.dataType, (ST.ArrayType, ST.MapType, ST.StructType)), f.name
    got: dict[int, dict[int, float]] = {}
    for r in flat.collect():
        got.setdefault(r.doc_id, {})[r.dim_idx] = r.value
    assert set(got) == set(vec)
    for d, comps in got.items():
        assert len(comps) == 64
        assert [comps[i] for i in range(64)] == vec[d]


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    """C66 == C30 bit for bit: bloom pruning is one-sided and the
    exact confirm join removes false positives, so the plan change
    must not change a single row."""
    exact = {r.doc_id: (r.n_shared, r.contaminated)
             for r in tp.decontaminate(spark, sf_dir).collect()}
    bloom = {r.doc_id: (r.n_shared, r.contaminated)
             for r in tp.decontaminate_bloom(spark, sf_dir).collect()}
    assert bloom == exact and len(bloom) > 0


def test_bloom_build_bounded_and_probe_prunes(spark, sf_dir):
    """The build collect is bounded by the bitmap (<= m/64 words
    regardless of key count); the probe keeps every member (one-
    sided) and prunes most non-members at the documented sizing."""
    from pyspark.sql import functions as F
    from gcp_data_engineering_workshop_spark.operators import bloom as BL

    m_bits, k = 1 << 14, 5
    keys = spark.range(500).select(
        F.concat(F.lit("k"), F.col("id")).alias("g"))
    hashed = keys.select(T.kr_hash(F.col("g")).alias("h"))
    bm = BL.bloom_build(hashed, "h", m_bits=m_bits, n_hashes=k)
    assert bm.shape == (m_bits // 64,)
    probe = BL.bloom_might_contain(bm, k)

    def hits(df):
        return (df.select(T.kr_hash(F.col("g")).alias("h"))
                .where(probe(BL.bloom_positions(F.col("h"), m_bits, k)))
                .count())

    assert hits(keys) == 500  # no member is ever pruned
    others = spark.range(5000).select(
        F.concat(F.lit("x"), F.col("id")).alias("g"))
    fp = hits(others)
    # m/n = 32 bits per key, k=5 => theoretical FP ~ 2e-4; allow 100x
    assert fp <= 100, f"false-positive rate too high: {fp}/5000"


def test_span_dedup_join_is_hash_not_sort(spark, sf_dir):
    """Plan guard for the C52/C61 annotate join: the span-key join
    must run as a ShuffledHashJoin (build on distinct spans, stream
    occurrences) — an SMJ here sorts both sides on long string keys,
    the stage's dominant cost, and a regression would reintroduce
    it silently."""
    for fn in (tp.span_dedup_apply, tp.span_dedup_keep_first):
        plan = fn(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ShuffledHashJoin" in plan
        assert "SortMergeJoin" not in plan, fn.__name__


def test_wide_hash_cross_engine_parity(spark):
    """Task-7 utility: wide_hash (packed 62-bit two-channel KR) and
    span_keys_of replay bit-identically in DuckDB on adversarial
    strings — empties, single chars, long repeats, punctuation,
    whitespace-sensitive variants, and shingle-boundary traps like
    ('ab c' vs 'a bc') that a separator-free hash would conflate."""
    import duckdb

    strings = [
        "", "a", " ", "  ", "ab c", "a bc", "abc", "cba",
        "the quick brown fox", "the quick brown fo", "x" * 500,
        "0123456789" * 40, "word " * 50, "!@#$%^&*()_+-=[]{};':,./<>?",
        "same same same same", "Same same same same",
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: r.h for r in df.select(
        "s", T.wide_hash("s").alias("h")).collect()}
    con = duckdb.connect()
    for s in strings:
        want = con.execute(
            f"SELECT {T.wide_hash_sql('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got[s] == want, s
        assert 0 <= got[s] < T.KR_MOD * T.KR2_MOD

    # span keys: word arrays with repeats, short docs, boundary traps
    docs = [
        (0, ["a", "b", "c", "d", "e"]),
        (1, ["b", "c", "d", "e", "f", "g"]),
        (2, ["a"]), (3, []),
        (4, ["ab", "c", "d"]), (5, ["a", "bc", "d"]),
        (6, ["x"] * 20),
    ]
    L = 3
    wdf = spark.createDataFrame(docs, "doc_id long, w array<string>")
    wh1, wh2 = T.word_hashes_of(F.col("w"))
    skeys = {r.doc_id: list(r.ks) for r in wdf.select(
        "doc_id", T.span_keys_of(wh1, wh2, L).alias("ks")).collect()}
    for doc_id, w in docs:
        lit = "[" + ", ".join(f"'{t}'" for t in w) + "]"
        want = con.execute(
            f"SELECT {T.span_keys_sql(lit, L)}").fetchone()[0]
        assert skeys[doc_id] == list(want), (doc_id, skeys[doc_id], want)
    # equal word windows <-> equal keys on this corpus (docs 0/1 share
    # the b-c-d and c-d-e windows; doc 6 is all-same)
    assert skeys[0][1] == skeys[1][0] and skeys[0][2] == skeys[1][1]
    assert skeys[0][0] not in skeys[1]
    assert len(set(skeys[6])) == 1
    assert skeys[2] == [] and skeys[3] == []
    assert skeys[4][0] != skeys[5][0]


def test_bm25_topk_invariants(spark, sf_dir):
    """C67: per-query ranks are 1..k with non-increasing scores,
    candidates come only from the training split (queries are the
    held-out doc_id %% 97 slice), and scores are positive (Lucene
    idf variant is non-negative, tf saturation positive)."""
    rows = tp.bm25_topk(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.doc_id % 97 != 0 and r.query_id % 97 == 0
        assert r.score > 0
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len(rs) <= 5


def _python_bpe(word_freqs, n_merges, min_count=2):
    """Independent subword-nmt-style reference: dict of word->freq,
    symbols are char lists, each round counts adjacent pairs, merges
    the (count desc, pair lexicographic asc) argmax left-to-right."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for sy, f in vocab.items():
            for x, y in zip(sy, sy[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, a, b, a + b, cnt))
        new_vocab = {}
        for sy, f in vocab.items():
            out, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_train_bpe_vocab_matches_python_reference(spark, sf_dir):
    """C68: the distributed trainer's merge table equals the
    pure-Python subword-nmt-style reference EXACTLY — ranks, pairs,
    merged tokens, and weighted counts — on the real corpus."""
    from gcp_data_engineering_workshop_spark.operators.bpe import word_freqs

    wf = {r.word: r.freq
          for r in word_freqs(tp._docs(spark, sf_dir)).collect()}
    want = _python_bpe(wf, 12)
    got = [(r.merge_rank, r.left, r.right, r.merged, r.pair_count)
           for r in tp.train_bpe_vocab(spark, sf_dir, 12).collect()]
    got.sort()
    assert got == want and len(got) == 12


def test_bpe_merge_application_edge_cases(spark):
    """The JVM fold reproduces subword-nmt's left-to-right scan on
    the overlap traps: runs of the merged pair, the pair's left
    symbol repeated, and merged-token/raw-symbol name clashes."""
    from pyspark.sql import functions as F
    from gcp_data_engineering_workshop_spark.operators.bpe import (
        _apply_merge)

    cases = [
        (["a", "a", "a"], ("a", "a"), ["aa", "a"]),
        (["a", "a", "a", "a"], ("a", "a"), ["aa", "aa"]),
        (["a", "a", "b"], ("a", "b"), ["a", "ab"]),
        (["a", "b", "a", "b"], ("a", "b"), ["ab", "ab"]),
        (["ab", "b"], ("a", "b"), ["ab", "b"]),
        (["a", "b", "b"], ("a", "b"), ["ab", "b"]),
        ([], ("a", "b"), []),
        (["x"], ("a", "b"), ["x"]),
    ]
    df = spark.createDataFrame(
        [(i, sy) for i, (sy, _, _) in enumerate(cases)],
        "i int, sy array<string>")
    for i, (sy, (a, b), want) in enumerate(cases):
        got = df.where(F.col("i") == i).select(
            _apply_merge(F.col("sy"), a, b).alias("m")).collect()[0].m
        assert got == want, (sy, (a, b), got, want)


def test_dsir_select_invariants(spark, sf_dir):
    """C70: selection keeps exactly floor(n_raw/4) docs from the raw
    (non-src0/src1) pool, ranks are 1..n_keep with non-increasing
    scores, and the kept set is the global top by (score, -doc_id) —
    verified against an independent full-pool scoring via the
    operator's own score column plus a raw recount."""
    from pyspark.sql import functions as F

    from gcp_data_engineering_workshop_spark.catalog import load_table

    rows = tp.dsir_select(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, "documents", sf_dir)
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source")
           .collect()}
    n_raw = sum(1 for s in src.values() if s not in ("src0", "src1"))
    assert len(rows) == n_raw // 4
    for r in rows:
        assert src[r.doc_id] not in ("src0", "src1")
    rs = sorted(rows, key=lambda r: r.sel_rank)
    assert [r.sel_rank for r in rs] == list(range(1, len(rs) + 1))
    scores = [r.score for r in rs]
    assert scores == sorted(scores, reverse=True)
    # determinism: a second run returns the identical selection
    again = tp.dsir_select(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_perplexity_buckets_invariants(spark, sf_dir):
    """C71: every doc lands in exactly one tercile, sizes differ by
    at most one, and score ordering respects the bucket order
    (min head score >= max middle score >= ... via the rank)."""
    rows = tp.perplexity_buckets(spark, sf_dir).collect()
    assert rows
    assert len({r.doc_id for r in rows}) == len(rows)
    sizes = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    h = [r.avg_logp for r in rows if r.bucket == "head"]
    m = [r.avg_logp for r in rows if r.bucket == "middle"]
    t = [r.avg_logp for r in rows if r.bucket == "tail"]
    assert min(h) >= max(m) and min(m) >= max(t)


def test_weighted_sample_parity_and_plan(spark, sf_dir):
    """C72: the selection EXACTLY matches an independent pure-Python
    Efraimidis-Spirakis replay (same content-hash uniforms), and the
    physical plan is per-partition top-k, never a global sort."""
    import math
    import re

    from gcp_data_engineering_workshop_spark.catalog import load_table

    df = tp.weighted_sample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    got = [(r.doc_id, r.weight, r.sample_key) for r in df.collect()]
    docs = load_table(spark, "documents", sf_dir) \
        .select("doc_id", "text").collect()
    KR_MOD = 2147483647
    ref = []
    for r in docs:
        norm = re.sub(r"\s+", " ", r.text.lower()).strip()
        h = 0
        for ch in norm:
            h = (h * 31 + ord(ch)) % KR_MOD
        w = len(norm.split(" "))
        key = round(math.log((h + 1) / 2147483648.0) / w, 9)
        ref.append((r.doc_id, w, key))
    ref.sort(key=lambda t: (-t[2], t[0]))
    assert sorted(got) == sorted(ref[:100])


def test_shuffle_corpus_invariants(spark, sf_dir):
    """C73: pos is a 1..n permutation, shard sizes balance to within
    one, (shard_id, pos_in_shard) is consistent with pos, and the
    order is a genuine shuffle (not doc_id order)."""
    rows = tp.shuffle_corpus(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    sizes = {}
    for r in rows:
        assert r.shard_id == (r.pos - 1) % 8
        assert r.pos_in_shard == (r.pos - 1) // 8 + 1
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
    assert by_pos != sorted(by_pos)


def test_winnow_guarantee_and_density(spark, sf_dir):
    """C74: the winnowing GUARANTEE on a hand corpus — two docs
    sharing a >= window + kgram - 1 = 7-word run share a selected
    fingerprint — plus the expected-density sanity band and the
    map-only plan (no Exchange)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta unique1 tail1"),
         (2, "lead2 alpha beta gamma delta epsilon zeta eta other2"),
         (3, "totally different words here nothing shared at all x y")],
        "doc_id bigint, text string")
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp()
    pdf = docs.toPandas()
    pdf["lang"] = "en"
    pdf["source"] = "src0"
    pdf["n_chars"] = pdf.text.str.len()
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(
        tmp, "documents.parquet"))
    out = {r.doc_id: r for r in
           tp.winnow_fingerprints(spark, tmp).collect()}
    # docs 1 and 2 share the 8-word run -> winnowing must select a
    # common fingerprint; rebuild the selected sets to check overlap
    from pyspark.sql import functions as F

    from gcp_data_engineering_workshop_spark.functions import textfns as T
    d = tp._docs(spark, tmp).select(
        "doc_id", T.words("text").alias("w"))
    wh1, wh2 = T.word_hashes_of(F.col("w"))
    sp = d.select("doc_id", T.span_keys_of(wh1, wh2, 4).alias("sp"))
    sel = {r.doc_id: set(r.s) for r in sp.select("doc_id", F.expr(
        "array_distinct(transform(sequence(0, size(sp) - 4), "
        "i -> array_min(slice(sp, i + 1, 4))))").alias("s")).collect()}
    assert sel[1] & sel[2], "guaranteed shared fingerprint missing"
    assert not (sel[1] & sel[3])
    for doc_id, r in out.items():
        assert r.n_selected == len(sel[doc_id])
    # corpus run: density around 2/(w+1) = 0.4 of kgrams, loosely
    rows = tp.winnow_fingerprints(spark, sf_dir).collect()
    big = [r for r in rows if r.n_kgrams >= 20]
    assert big
    dens = [r.n_selected / r.n_kgrams for r in big]
    assert 0.15 <= sum(dens) / len(dens) <= 0.7


def test_longest_dup_span_hand_corpus(spark):
    """C75: a planted 14-word shared run (>= span+4 positions
    covered) yields longest_dup_run == covered-run length on both
    docs; a unique doc reports 0."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"s{i}" for i in range(14))
    rows = [
        (1, shared + " u1a u1b u1c u1d u1e"),
        (2, "v2a v2b " + shared + " w2a w2b"),
        (3, " ".join(f"only3_{i}" for i in range(20))),
    ]
    tmp = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [len(r[1]) for r in rows],
    }), os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r.longest_dup_run
           for r in tp.longest_dup_span(spark, tmp).collect()}
    # 14 shared words -> 5 dup 10-spans -> covered run of 14 positions
    assert out[1] == 14 and out[2] == 14 and out[3] == 0


def test_quality_attributes_matches_standalone(spark, sf_dir):
    """C76: the one-pass bundle equals the standalone C8/C9/C10
    queries column for column."""
    bundle = {r.doc_id: r for r in
              tp.quality_attributes(spark, sf_dir).collect()}
    for r in tp.text_quality(spark, sf_dir).collect():
        b = bundle[r.doc_id]
        assert (b.n_words, b.n_chars, b.avg_word_len, b.punct_ratio,
                b.stopword_ratio_en, b.quality_score) == \
            (r.n_words, r.n_chars, r.avg_word_len, r.punct_ratio,
             r.stopword_ratio_en, r.quality_score)
    for r in tp.text_lang_id(spark, sf_dir).collect():
        assert bundle[r.doc_id].lang_pred == r.lang_pred
    for r in tp.token_count(spark, sf_dir).collect():
        b = bundle[r.doc_id]
        assert (b.ws_tokens, b.bpe_tokens) == (r.ws_tokens, r.bpe_tokens)


def test_decontaminate_spans_hand_corpus(spark):
    """C77: a 12-word eval quote inside a training doc is removed
    (all positions its 10-spans cover), untouched train docs keep
    their text verbatim, and eval docs never appear in the output."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    quote = " ".join(f"q{i}" for i in range(12))
    rows = [
        (0, quote + " eval tail words"),                     # eval (0 % 97)
        (1, "lead one two " + quote + " after x y z"),       # contaminated
        (2, " ".join(f"clean{i}" for i in range(15))),       # clean train
    ]
    tmp = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [len(r[1]) for r in rows],
    }), os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in
           tp.decontaminate_spans(spark, tmp).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_removed_words == 12 and out[1].n_spans_removed == 1
    assert "q0" not in out[1].cleaned_text
    assert out[1].cleaned_text == "lead one two after x y z"
    assert out[2].n_removed_words == 0
    assert out[2].cleaned_text == rows[2][1]


def test_dedup_keep_best_invariants(spark, sf_dir):
    """C78: exactly one survivor per component, the survivor has the
    component's max quality score (doc_id tie-break), and docs in no
    group pass through with component == doc_id."""
    from gcp_data_engineering_workshop_spark.operators.dedup import (
        minhash_lsh_pairs)
    from gcp_data_engineering_workshop_spark.operators.graph import (
        connected_components)

    rows = tp.dedup_keep_best(spark, sf_dir).collect()
    comp = {r.doc_id: r.component for r in connected_components(
        minhash_lsh_pairs(tp._docs(spark, sf_dir), tau=0.9)).collect()}
    score = {r.doc_id: r.quality_score
             for r in tp.text_quality(spark, sf_dir).collect()}
    by_comp = {}
    for d, c in comp.items():
        by_comp.setdefault(c, []).append(d)
    surv = {r.doc_id for r in rows}
    for c, members in by_comp.items():
        kept = [d for d in members if d in surv]
        assert len(kept) == 1, (c, kept)
        best = min(members, key=lambda d: (-score[d], d))
        assert kept[0] == best
    for r in rows:
        if r.doc_id not in comp:
            assert r.component == r.doc_id
        assert r.quality_score == score[r.doc_id]


def test_kneser_ney_properties(spark, sf_dir):
    """C81: per-doc scores are valid (finite, negative log probs),
    the per-history conditional sums to <= 1 (KN is a proper
    distribution over SEEN continuations; unseen mass goes to the
    continuation model), and a repeated-bigram doc outscores a
    one-shot-bigram doc under the corpus LM."""
    import math

    rows = tp.kneser_ney_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_bigrams > 0:
            assert r.avg_logp < 0 and math.isfinite(r.avg_logp)
    # distribution check on the counts, independent re-derivation
    from collections import Counter, defaultdict
    import re

    from gcp_data_engineering_workshop_spark.catalog import load_table
    texts = [r.text for r in
             load_table(spark, "documents", sf_dir).collect()]
    c12 = Counter()
    for t in texts:
        ws = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1 = Counter(); fwd = Counter(); bwd = Counter()
    for (a, b), c in c12.items():
        c1[a] += c; fwd[a] += 1; bwd[b] += 1
    n_types = len(c12)
    by_hist = defaultdict(float)
    for (a, b), c in c12.items():
        p = max(c - 0.75, 0.0) / c1[a] \
            + (0.75 * fwd[a] / c1[a]) * (bwd[b] / n_types)
        by_hist[a] += p
    assert all(s <= 1.0 + 1e-9 for s in by_hist.values())


def test_containment_pairs_asymmetry(spark):
    """C83: a short doc fully quoted inside a long one scores
    containment 1.0 in the short->long direction only, while the
    symmetric Jaccard of the same pair stays low."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    short = " ".join(f"s{i}" for i in range(10))
    longd = ("intro words here " + short + " "
             + " ".join(f"l{i}" for i in range(40)))
    rows = [(1, short), (2, longd),
            (3, " ".join(f"x{i}" for i in range(12)))]
    tmp = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [len(r[1]) for r in rows],
    }), os.path.join(tmp, "documents.parquet"))
    got = {(r.doc_src, r.doc_dst): r.containment
           for r in tp.containment_pairs(spark, tmp).collect()}
    assert got.get((1, 2)) == 1.0
    assert (2, 1) not in got  # long doc is NOT contained in short
    assert all(k[0] != 3 and k[1] != 3 for k in got)
    jac = {(r.doc_a, r.doc_b) for r in
           tp.ngram_jaccard(spark, tmp).collect()}
    assert (1, 2) not in jac and (2, 1) not in jac


def test_bpe_train_local_matches_recount_reference_deep(spark, sf_dir):
    """C68 hybrid: the incremental-delta driver loop equals the
    recount-from-scratch reference EXACTLY deep into the merge
    table (200 rounds — where any delta-accounting drift would
    compound and surface)."""
    from gcp_data_engineering_workshop_spark.operators.bpe import (
        bpe_train_local, word_freqs)

    wf = {r.word: r.freq
          for r in word_freqs(tp._docs(spark, sf_dir)).collect()}
    want = _python_bpe(wf, 200)
    got = bpe_train_local(wf.items(), n_merges=200)
    assert got == want and len(got) > 50


def test_bpe_train_distributed_matches_local(spark, sf_dir):
    """The all-distributed round loop and the hybrid driver loop
    learn the identical merge table."""
    from gcp_data_engineering_workshop_spark.operators.bpe import (
        bpe_train, bpe_train_local, word_freqs)

    freqs = word_freqs(tp._docs(spark, sf_dir))
    dist = bpe_train(freqs, n_merges=6)
    local = bpe_train_local(
        ((r.word, r.freq) for r in freqs.toLocalIterator()),
        n_merges=6)
    assert dist == local and len(dist) == 6


def test_corpus_report_by_source_consistent_with_global(spark, sf_dir):
    """C86: the per-source card's columns sum to the global C79
    numbers where the metrics are additive (n_docs, n_words_total,
    contaminated docs), and every source in the corpus appears."""
    import gcp_data_engineering_workshop_spark.plans.textpipeline as tp
    from gcp_data_engineering_workshop_spark.catalog import load_table
    import pyspark.sql.functions as F

    per = tp.corpus_report_by_source(spark, sf_dir).collect()
    glob = {r.metric: r.value
            for r in tp.corpus_report(spark, sf_dir).collect()}
    d = load_table(spark, "documents", sf_dir)
    assert {r.source for r in per} == \
        {r.source for r in d.select("source").distinct().collect()}
    assert sum(r.n_docs for r in per) == int(glob["n_docs"])
    assert sum(r.n_words_total for r in per) == int(glob["n_words_total"])
    assert sum(r.contaminated_docs for r in per) == \
        int(glob["contaminated_docs"])
    # per-source dup mass can only be <= the global pool (splitting
    # by source can separate dup partners, never create new ones)
    assert sum(r.exact_dup_removable for r in per) <= \
        int(glob["exact_dup_removable"])


def test_auto_minhash_params_bounds():
    """C87: the chosen banding meets the documented S-curve recall
    bound at tau and respects the permutation budget; the infeasible
    corner refuses instead of silently under-recalling."""
    import math
    import pytest
    from gcp_data_engineering_workshop_spark.operators.dedup import (
        auto_minhash_params)

    for tau, n in [(0.9, 1000), (0.8, 100000), (0.7, 10_000_000)]:
        n_perms, n_bands = auto_minhash_params(tau, n)
        r = n_perms // n_bands
        assert n_perms == r * n_bands and n_perms <= 256
        miss = (1 - tau ** r) ** n_bands
        assert miss <= 1e-6, (tau, n, r, n_bands, miss)
    with pytest.raises(ValueError):
        auto_minhash_params(0.05, 1000, target_miss=1e-12,
                            max_perms=8)


def test_dedup_minhash_auto_equals_exact_pairs(spark, sf_dir):
    """C87 output == the exact verified pair set (same contract the
    fixed 64x16 banding is oracle-certified against): the auto
    banding only moves candidate traffic, never the verified
    result."""
    import gcp_data_engineering_workshop_spark.plans.textpipeline as tp

    auto = {(r.doc_a, r.doc_b) for r in
            tp.dedup_minhash_auto(spark, sf_dir).collect()}
    fixed = {(r.doc_a, r.doc_b) for r in
             tp.dedup_minhash_lsh(spark, sf_dir).collect()}
    assert auto == fixed and len(auto) > 0


def test_contamination_report_reconciles_with_flags(spark, sf_dir):
    """C89: bucket counts sum to the training-doc count, and the
    nonzero buckets' total equals C30's contaminated-doc count."""
    import gcp_data_engineering_workshop_spark.plans.textpipeline as tp

    rep = {r.bucket: (r.n_docs, r.frac)
           for r in tp.contamination_report(spark, sf_dir).collect()}
    flags = tp.decontaminate(spark, sf_dir)
    n_train = flags.count()
    n_cont = flags.where("contaminated").count()
    assert sum(n for n, _ in rep.values()) == n_train
    assert sum(n for b, (n, _) in rep.items() if b != "0") == n_cont
    assert abs(sum(f for _, f in rep.values()) - 1.0) < 1e-4
