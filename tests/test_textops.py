"""Training-data operators: dedup family, ANN, text analysis,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler import textops


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base + " extra"),  # near-dup of 0
        (2, base),  # exact dup of 0
        (3, "completely different words about spark shuffles and parquet files"),
        (4, "another unrelated document mentioning bloom filters and politeness"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = textops.exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_id[0] == 2  # docs 0 and 2 collapse, min doc_id survives
    assert len(out) == 4


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(docs, n_hashes=16, bands=8).collect()
    }
    assert (0, 2) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (1, 2) in pairs  # near-dup caught by a band
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_verification(spark, docs):
    cand = spark.createDataFrame([(0, 1), (0, 3)], "doc_a long, doc_b long")
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.ngram_jaccard_pairs(docs, cand).collect()
    }
    assert out[(0, 1)] > 0.7  # near-dup
    assert out[(0, 3)] < 0.1  # unrelated


def test_simhash_near_dup(spark, docs):
    out = textops.simhash_dedup(docs, hamming_max=10).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert pairs[(0, 2)] == 0  # identical text → identical simhash
    assert (0, 1) in pairs  # near-dup within hamming budget
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_knn_bruteforce_and_lsh(spark):
    import numpy as np

    rng = np.random.RandomState(42)
    base = rng.randn(8)
    rows = []
    for i in range(50):
        v = rng.randn(8)
        rows.append((i, [float(x) for x in v]))
    # plant a vector almost identical to the query
    rows.append((99, [float(x) for x in (base + 0.01 * rng.randn(8))]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in base]
    top = textops.knn_bruteforce(emb, q, k=3).collect()
    assert top[0]["vec_id"] == 99 and top[0]["cos_sim"] > 0.99
    # LSH path: the planted near-identical vector lands in the query's
    # bucket (identical sign pattern) and tops the pruned scan
    lsh = textops.knn_lsh_bucketed(emb, q, k=3, n_planes=4).collect()
    assert lsh and lsh[0]["vec_id"] == 99


def test_language_and_quality_and_tokens(spark, docs):
    lang = {r["doc_id"]: r["lang_pred"] for r in textops.language_id(docs).collect()}
    assert lang[0] == "en"  # stopword-rich
    q = {r["doc_id"]: r for r in textops.quality_score(docs).collect()}
    assert 0 < q[0]["quality"] <= 1.0
    t = {r["doc_id"]: r for r in textops.token_counts(docs).collect()}
    assert t[0]["ws_tokens"] == 14
    fp = {r["doc_id"]: r["fp_prefix"] for r in textops.fingerprint(docs).collect()}
    assert fp[0] == fp[2] and fp[0] != fp[3]


def test_media_features_plumbing(spark):
    refs = spark.createDataFrame(
        [("img://a/1.jpg",), ("audio://b/2.wav",)], "media_ref string"
    )
    out = {r["media_ref"]: r for r in textops.media_features(refs).collect()}
    assert out["img://a/1.jpg"]["kind"] == "img"
    assert out["audio://b/2.wav"]["kind"] == "audio"
    assert len(out["img://a/1.jpg"]["feature"]) == 4
    # decode=True is the real-decoder seam: must fail loudly, not fake
    with pytest.raises(Exception):
        textops.media_features(refs, decode=True).collect()


def test_minhash_signature_shape(spark, docs):
    sigs = textops.minhash_signatures(docs, n_hashes=8).collect()
    assert all(len(r["sig"]) == 8 for r in sigs)
    by_id = {r["doc_id"]: tuple(r["sig"]) for r in sigs}
    assert by_id[0] == by_id[2]  # identical docs → identical signatures
    assert by_id[0] != by_id[3]


def test_media_decode_real_numpy_path(spark):
    """media_decode_features parses real binary payloads (SIMG raw
    container) with numpy and reproduces a direct-numpy reference
    computation bit-for-bit; malformed blobs are skipped."""
    import numpy as np

    from crawler import synth
    from crawler.textops import decode_image_features, media_decode_features

    blobs = synth.synth_media_blobs(spark, 20)
    out = {r["media_ref"]: r for r in media_decode_features(blobs).collect()}
    raw = {r["media_ref"]: bytes(r["blob"]) for r in blobs.collect()}
    assert len(out) == 20
    for ref, blob in raw.items():
        w = int.from_bytes(blob[4:6], "big")
        h = int.from_bytes(blob[6:8], "big")
        c = blob[8]
        img = np.frombuffer(blob, dtype=np.uint8, offset=9).reshape(h, w, c)
        r = out[ref]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["n_pixel_bytes"] == w * h * c
        assert r["mean"] == float(img.astype(np.float64).mean())
        assert r["std"] == float(img.astype(np.float64).std())
        assert r["channel_means"] == [float(m) for m in img.astype(np.float64).mean(axis=(0, 1))]
        # scalar twin agrees with the distributed stage
        assert decode_image_features(blob)[4] == r["mean"]
    # malformed payloads are dropped, not crashed on
    bad = spark.createDataFrame(
        [("x://1", b"NOPE"), ("x://2", None), ("x://3", b"SIMG\x00\x04\x00\x04\x03junk")],
        "media_ref string, blob binary",
    )
    assert media_decode_features(bad).count() == 0


def _np_cosine(a, b):
    import numpy as np

    return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)


def test_knn_lsh_multiprobe_numpy_mirror(spark):
    """Multi-probe LSH kNN equals an independent numpy mirror: same
    buckets, same lowest-|margin| Hamming-1 probe set, same top-k."""
    import numpy as np

    from crawler.textops import knn_lsh_bucketed, lsh_planes

    rng = np.random.RandomState(11)
    dim, n_planes, n_probes, k = 16, 5, 3, 6
    vecs = {i: rng.randn(dim) for i in range(1, 61)}
    q = rng.randn(dim)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = [
        (r["vec_id"], round(r["cos_sim"], 6))
        for r in knn_lsh_bucketed(
            emb, [float(x) for x in q], k=k, n_planes=n_planes, n_probes=n_probes
        ).collect()
    ]

    planes = lsh_planes(n_planes, dim)
    margins = planes @ q
    qb = int(sum((1 << i) for i in range(n_planes) if margins[i] > 0))
    flips = np.argsort(np.abs(margins), kind="stable")[: n_probes - 1]
    probes = {qb} | {qb ^ (1 << int(i)) for i in flips}
    cand = [
        i
        for i, v in vecs.items()
        if int(sum((1 << p) for p in range(n_planes) if float(planes[p] @ v) > 0))
        in probes
    ]
    expect = sorted(
        ((i, _np_cosine(vecs[i], q)) for i in cand), key=lambda t: (-t[1], t[0])
    )[:k]
    assert out == expect
    # multi-probe candidates strictly contain the single-probe bucket's
    single = {
        r["vec_id"]
        for r in knn_lsh_bucketed(
            emb, [float(x) for x in q], k=60, n_planes=n_planes, n_probes=1
        ).collect()
    }
    multi = {
        r["vec_id"]
        for r in knn_lsh_bucketed(
            emb, [float(x) for x in q], k=60, n_planes=n_planes, n_probes=n_probes
        ).collect()
    }
    assert single <= multi


def test_embedding_neardup_planted(spark):
    """Banded-LSH embedding near-dup finds a planted near-identical
    pair and matches a numpy mirror of the banding + verify exactly."""
    import numpy as np

    from crawler.textops import embedding_neardup_pairs, lsh_planes

    rng = np.random.RandomState(5)
    dim = 16
    vecs = {i: rng.randn(dim) for i in range(40)}
    v = rng.randn(dim)
    vecs[100] = v
    vecs[101] = v + 0.01 * rng.randn(dim)  # planted near-dup (cos ≈ 1)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vv]) for i, vv in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = [
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in embedding_neardup_pairs(
            emb, threshold=0.9, n_planes=12, n_bands=3, dim=dim
        ).collect()
    ]
    planted = [(a, b, c) for a, b, c in out if (a, b) == (100, 101)]
    assert planted and planted[0][2] > 0.99

    # numpy mirror: same bands → same candidate set → same verified pairs
    planes = lsh_planes(12, dim)
    sigs = {
        i: [
            int(
                sum(
                    (1 << j)
                    for j in range(4)
                    if float(planes[b * 4 + j] @ vv) > 0
                )
            )
            for b in range(3)
        ]
        for i, vv in vecs.items()
    }
    ids = sorted(vecs)
    expect = sorted(
        (a, b, _np_cosine(vecs[a], vecs[b]))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if any(sigs[a][band] == sigs[b][band] for band in range(3))
        and _np_cosine(vecs[a], vecs[b]) >= 0.9
    )
    assert out == expect


def test_knn_ivf_numpy_mirror(spark):
    """IVF-flat kNN equals a numpy mirror: same sampled centroids, same
    rounded-cosine argmax assignment, same nprobe cells, same top-k."""
    import numpy as np

    from crawler.textops import knn_ivf

    rng = np.random.RandomState(3)
    dim, n_cells, n_probe, k = 12, 4, 2, 5
    vecs = {i: rng.randn(dim) for i in range(1, 81)}
    q = rng.randn(dim)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = [
        (r["vec_id"], round(r["cos_sim"], 6))
        for r in knn_ivf(
            emb, [float(x) for x in q], k=k, n_cells=n_cells, n_probe=n_probe
        ).collect()
    ]

    cents = {c: vecs[c] for c in range(1, n_cells + 1)}
    assign = {
        i: min(
            sorted(cents),
            key=lambda c: (-_np_cosine(vv, cents[c]), c),
        )
        for i, vv in vecs.items()
    }
    qcells = sorted(sorted(cents), key=lambda c: (-_np_cosine(q, cents[c]), c))[
        :n_probe
    ]
    cand = [i for i, cell in assign.items() if cell in qcells]
    expect = sorted(
        ((i, _np_cosine(vecs[i], q)) for i in cand), key=lambda t: (-t[1], t[0])
    )[:k]
    assert out == expect
    # the probed cells really pruned the corpus (not a full scan)
    assert len(cand) < len(vecs)


def test_curate_corpus_first_wins(spark, tmp_path):
    """curate_corpus pipeline: language+quality gates compose with
    exact-dedup first-wins — of two identical surviving docs only the
    min doc_id remains; gated-out docs never reach the dedup."""
    import __spark_entry__ as E

    good = (
        "the quick brown fox and the lazy dog are in the park with a ball "
        "and it is a fine day for all of the animals to be on the grass "
        "near the river bank where the water is clear and the air is warm"
    )
    rows = [
        (1, good),
        (7, good),  # exact dup of 1 — must lose first-wins
        (3, "zzz qqq xxx"),  # fails the language gate
        (4, good + " indeed the day is long and the sun is high above"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["doc_id"] for r in E._q_curate_corpus(spark, str(tmp_path)).collect()}
    assert out == {1, 4}


def test_simhash_dups_query_matches_textops_kernel(spark, tmp_path):
    """The driver-checked simhash_dups query (hi/lo halves, chunk
    blocking in SQL-reproducible form) must emit exactly the pair set of
    textops.simhash_dedup (the 64-bit kernel) at the same threshold."""
    import __spark_entry__ as E

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    expected = {
        (int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
        for r in textops.simhash_dedup(docs, hamming_max=3).collect()
    }
    got = {
        (int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
        for r in E._q_simhash_dups(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expected


def test_bit_vote_memory_bounded_on_long_docs():
    """VERDICT r2 #3: 100 docs × 10k tokens (1M tokens) must not
    materialize the old (tokens × 64) int64 broadcast (~512 MB);
    the chunked unpackbits path stays under ~100 MB transient.
    Values are pinned against an independent per-row reference vote."""
    import tracemalloc

    import numpy as np
    import pandas as pd

    from crawler.textops import _bit_vote

    rng = np.random.RandomState(7)
    n_docs, n_tok = 100, 10_000
    his = pd.Series(
        [rng.randint(0, 2**32, n_tok).astype(np.int64) for _ in range(n_docs)]
    )
    los = pd.Series(
        [rng.randint(0, 2**32, n_tok).astype(np.int64) for _ in range(n_docs)]
    )

    def ref_one(h, l):
        words = (h.astype(np.uint64) << np.uint64(32)) | l.astype(np.uint64)
        out = np.uint64(0)
        for b in range(64):
            ones = int(((words >> np.uint64(b)) & np.uint64(1)).sum())
            if 2 * ones - len(words) > 0:
                out |= np.uint64(1) << np.uint64(b)
        return np.int64(out)

    expect = [ref_one(h, l) for h, l in zip(his[:5], los[:5])]
    tracemalloc.start()
    got = _bit_vote(his, los)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert list(got[:5]) == expect
    assert len(got) == n_docs
    assert peak < 250 * 1024 * 1024, f"bit-vote transient peak {peak/2**20:.0f} MB"


def test_repetition_stats_golden(spark):
    # hand-computed Gopher-style repetition metrics
    rows = [
        (0, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 5 total,
                                     # 2 distinct; dup=0.6, top=3/5
        (1, "w x y z"),              # all bigrams unique
        (2, "solo"),                 # < 2 tokens -> no bigrams
        (3, "r r r r r r r r r r"),  # one bigram repeated 9x
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["dup_2gram_frac"], r["top_2gram_share"], r["keep"]
        )
        for r in textops.repetition_stats(df).collect()
    }
    assert got[0] == (6, 0.6, 0.6, False)
    assert got[1] == (4, 0.0, round(1 / 3, 6), False)
    assert got[2] == (1, 0.0, 0.0, True)
    assert got[3] == (10, round(1 - 1 / 9, 6), 1.0, False)


# ------------------------------------------ corpus curation, part 2


def test_paragraph_dedup_first_wins_and_reassembly(spark):
    # width=3 chunks: doc 0 = [A B C][D E F]; doc 1 repeats chunk
    # "a b c" (dropped, doc 0 saw it first) then a fresh chunk.
    rows = [
        (0, "a b c d e f"),
        (1, "a b c x y z"),
        (2, "x y z"),  # dup of doc 1's surviving chunk -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textops.paragraph_dedup(docs, width=3).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[0]["n_paras"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["kept_md5"] == md5("a b c d e f")
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["kept_md5"] == md5("x y z")  # 'a b c' deduped away
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (1, 0)
    assert out[2]["kept_md5"] == md5("")  # everything deduped


def test_contamination_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the secret eval answer is blue")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (0, "we think the secret eval answer might differ"),  # 3-gram hit x2
            (1, "totally clean training text here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_overlap"] for r in
           textops.contamination(train, bench, shingle_n=3).collect()}
    # shared 3-grams: "the secret eval", "secret eval answer"
    assert out == {0: 2}


def test_gopher_quality_gates(spark):
    good = "the " + " ".join(f"word{i % 9}" for i in range(58)) + " of it"
    short = "the quick brown fox of it"  # < 50 words
    symbols = "the " + " ".join(["###"] * 58) + " of it"  # symbol ratio + alpha
    onesw = " ".join(f"word{i % 9}" for i in range(60)) + " the"  # 1 stopword
    rows = [(0, good), (1, short), (2, symbols), (3, onesw)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.gopher_quality(docs).collect()}
    assert out[0]["keep"] and out[0]["n_tokens"] == 61
    assert not out[1]["keep"]  # word count below 50
    assert not out[2]["keep"] and out[2]["symbol_ratio"] > 0.1
    assert not out[3]["keep"] and out[3]["n_stopwords"] == 1
    assert out[0]["n_stopwords"] >= 3  # the, of, it


def test_exact_substring_dedup_planted(spark):
    # doc 1 copies a 5-word window from doc 0 (two overlapping 4-word
    # windows would NOT trip n=5); doc 2 shares nothing; doc 3 copies
    # from BOTH doc 0 and doc 1 -> first_owner is the earliest.
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "xx alpha beta gamma delta epsilon yy"),
        (2, "totally unrelated words in this document here"),
        (3, "alpha beta gamma delta epsilon qq xx alpha beta gamma delta epsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["dup_windows"], r["first_owner"])
        for r in textops.exact_substring_dedup(docs, n=5).collect()
    }
    # doc 1 shares exactly one 5-gram window with doc 0
    # doc 3 shares 2 distinct windows of doc 0/1's ("alpha..epsilon"
    # and "xx alpha beta gamma delta" from doc 1) plus its own repeats
    assert 0 not in out and 2 not in out
    assert out[1] == (1, 0)
    assert out[3][1] == 0 and out[3][0] >= 2


def test_domain_stats_fixed_point_mean_and_verdict(spark):
    rows = [
        # 3 docs on kept.com: alphabetic text (quality ~high), stopwordy
        (0, "good.kept.com", "the quick brown fox jumps over the lazy dog again"),
        (1, "www.kept.com", "the fast red fox runs over the small hill today"),
        (2, "cdn.kept.com", "the calm blue bird flies over the tall tree now"),
        # 1 doc on thin.org: below min_docs -> dropped regardless
        (3, "only.thin.org", "the single document of this domain is here"),
        # 3 docs on junk.net: digit soup -> low alpha ratio -> dropped
        (4, "a.junk.net", "111 222 333 444 555 666 777 888 999 000"),
        (5, "b.junk.net", "123 456 789 012 345 678 901 234 567 890"),
        (6, "c.junk.net", "999 888 777 666 555 444 333 222 111 000"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r["tpd"]: r for r in textops.domain_stats(docs).collect()}
    assert set(out) == {"kept.com", "thin.org", "junk.net"}
    assert out["kept.com"]["n_docs"] == 3 and out["kept.com"]["keep"]
    assert not out["thin.org"]["keep"]  # below min_docs
    assert not out["junk.net"]["keep"]  # digit soup quality
    assert out["kept.com"]["en_fraction"] == 1.0
    assert out["junk.net"]["en_fraction"] == 0.0
    # fixed-point mean: recompute exactly in python
    import re as _re

    def q6(text):
        toks = text.lower().split(" ")
        alpha = len(_re.sub("[^a-zA-Z ]", "", text)) / max(len(text), 1)
        return round((min(max(len(toks), 1) / 100.0, 1.0) * 0.5 + alpha * 0.5) * 1e6)

    exp = round(sum(q6(r[2]) for r in rows[:3]) / (3 * 1e6), 6)
    assert out["kept.com"]["mean_quality"] == exp


def test_topk_per_group_is_lossless_vs_plain_window(spark):
    # fuzz: the salted two-phase prune must equal the single-window rank
    import random

    rng = random.Random(7)
    rows = [
        # group 'hot' is deliberately skewed (mega-stratum)
        (("hot" if rng.random() < 0.7 else f"g{rng.randrange(5)}"), i,
         rng.randrange(1000))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, score long")
    order = [F.desc("score"), F.asc("id")]
    fast = {
        (r["grp"], r["id"]): r["rk"]
        for r in textops.topk_per_group(
            df, "grp", order, k=7, salt=F.col("id"), buckets=4
        ).collect()
    }
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp").orderBy(*order)
    slow = {
        (r["grp"], r["id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 7)
        .collect()
    }
    assert fast == slow


def test_tfidf_top_terms_planted(spark):
    rows = [
        (0, "alpha alpha alpha shared", "s1"),
        (1, "beta shared shared", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = textops.tfidf_top_terms(docs, k=2).collect()
    top = {(r["source"], r["rk"]): (r["word"], r["tf"], r["dfreq"], r["score"])
           for r in out}
    # 'alpha': tf=3 df=1 -> 3.0 beats 'shared' in s1 (tf=1 df=2 -> 0.5)
    assert top[("s1", 1)] == ("alpha", 3, 1, 3.0)
    assert top[("s1", 2)] == ("shared", 1, 2, 0.5)
    # s2: 'beta' tf=1 df=1 -> 1.0 beats 'shared' tf=2 df=2 -> 1.0?  no:
    # equal scores tie-break on word asc -> 'beta' first
    assert top[("s2", 1)][0] == "beta"
    assert top[("s2", 2)][0] == "shared"


def test_sessionize_gap_split(spark):
    import datetime as dt

    import __spark_entry__ as E

    t0 = dt.datetime(2024, 1, 1)
    hours = lambda h: t0 + dt.timedelta(hours=h)  # noqa: E731
    rows = [
        # user 1: two events 1h apart (one session), then a 7h gap
        (0, hours(0), 1, "a", 1.0, "{}"),
        (1, hours(1), 1, "a", 2.0, "{}"),
        (2, hours(8), 1, "a", 4.0, "{}"),
        # user 2: single event
        (3, hours(2), 2, "b", 8.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["total_value"])
        for r in E.sessionize(ev, gap_us=6 * 3600 * 1_000_000).collect()
    }
    assert out == {(1, 1): (2, 3.0), (1, 2): (1, 4.0), (2, 1): (1, 8.0)}


def test_kmeans_spherical_matches_numpy_lloyd(spark):
    """Planted geometry + a full numpy mirror of the exact algorithm
    (seed centroids, rounded-cosine argmax w/ lowest-id ties, exact
    fixed-point centroid means, keep-old empty clusters)."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = {1: np.array([1.0, 0.0, 0.0, 0.0]), 2: np.array([0.0, 1.0, 0.0, 0.0])}
    rows = []
    for vid in range(1, 41):
        c = base[1 if vid % 2 else 2]
        rows.append((vid, (c + rng.normal(0, 0.05, 4)).astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["cluster"], r["cos"])
        for r in textops.kmeans_spherical(emb, k=2, n_iter=2).collect()
    }

    # numpy twin
    vecs = {vid: np.array(v, dtype=np.float64) for vid, v in rows}
    cents = {1: vecs[1].copy(), 2: vecs[2].copy()}

    def rcos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    def argmax(v):
        best = max(sorted(cents), key=lambda c: (rcos(v, cents[c]), -c))
        return best, rcos(v, cents[best])

    for _ in range(2):
        groups = {}
        for vid, v in vecs.items():
            groups.setdefault(argmax(v)[0], []).append(v)
        for c in cents:
            if c in groups:
                s = np.sum([np.round(v * 1e6) for v in groups[c]], axis=0)
                cents[c] = s / (len(groups[c]) * 1e6)
    want = {vid: argmax(v) for vid, v in vecs.items()}
    assert got == want
    # the two planted clusters actually separate
    assert {got[1][0], got[2][0]} == {1, 2}
    assert all(got[vid][0] == got[1][0] for vid in range(1, 41, 2))
    assert all(got[vid][0] == got[2][0] for vid in range(2, 41, 2))


def test_semdedup_matches_numpy_mirror(spark):
    """SemDeDup (Abbas et al. 2023) planted geometry: two clusters with
    one near-identical pair planted in each, plus an exact duplicate
    (centroid-cos tie → higher vec_id loses).  Expected keep set comes
    from an independent numpy mirror of the full spec: the kmeans
    kernel (seed centroids, rounded argmax, fixed-point means) then
    within-cluster pairs at rounded cosine ≥ tau, loser = higher
    centroid-cos / higher id."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = {1: np.array([1.0, 0, 0, 0]), 2: np.array([0, 1.0, 0, 0])}
    rows = []
    for vid in range(1, 31):
        c = base[1 if vid % 2 else 2]
        rows.append((vid, (c + rng.normal(0, 0.25, 4)).astype("float32").tolist()))
    # planted near-identical pairs: 31 ≈ 3's vector, 32 == 4's exactly
    v3 = np.array(rows[2][1], dtype="float32")
    rows.append((31, (v3 + np.float32(1e-3)).astype("float32").tolist()))
    rows.append((32, rows[3][1]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tau = 0.995
    got = {
        r["vec_id"]: (r["cluster"], r["cos"], r["keep"])
        for r in textops.semdedup(emb, k=2, n_iter=2, tau=tau).collect()
    }

    # numpy mirror
    vecs = {vid: np.array(v, dtype=np.float64) for vid, v in rows}
    cents = {1: vecs[1].copy(), 2: vecs[2].copy()}

    def rcos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    def argmax(v):
        best = max(sorted(cents), key=lambda c: (rcos(v, cents[c]), -c))
        return best, rcos(v, cents[best])

    for _ in range(2):
        groups = {}
        for vid, v in vecs.items():
            groups.setdefault(argmax(v)[0], []).append(v)
        for c in cents:
            if c in groups:
                s = np.sum([np.round(v * 1e6) for v in groups[c]], axis=0)
                cents[c] = s / (len(groups[c]) * 1e6)
    asg = {vid: argmax(v) for vid, v in vecs.items()}
    losers = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if asg[a][0] != asg[b][0] or rcos(vecs[a], vecs[b]) < tau:
                continue
            ca, cb = asg[a][1], asg[b][1]
            losers.add(a if (ca > cb or (ca == cb and a > b)) else b)
    want = {vid: (asg[vid][0], asg[vid][1], vid not in losers) for vid in vecs}
    assert got == want
    # the planted dups actually dropped one member each, nothing else
    assert losers and all(not got[v][2] for v in losers)
    assert {3, 31} & losers and {4, 32} & losers


def test_media_resize_nearest_numpy_mirror(spark):
    """Resize stage vs an inline numpy mirror: exact nearest-neighbor
    pixel picks (src = dst*src//out), identity when out == src dims,
    corrupt/truncated/foreign blobs silently skipped."""
    import numpy as np

    from crawler.textops import SIMG_MAGIC, media_resize_features

    def simg(w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
        return (
            SIMG_MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big")
            + bytes([3]) + px.tobytes()
        ), px.reshape(h, w, 3)

    b1, img1 = simg(10, 7, 1)
    b2, img2 = simg(4, 4, 2)  # identity: out dims == src dims
    rows = [
        ("ok://1", bytearray(b1)),
        ("ok://2", bytearray(b2)),
        ("bad://magic", bytearray(b"XXXX" + b1[4:])),
        ("bad://trunc", bytearray(b1[:20])),
        ("bad://null", None),
    ]
    got = {
        r["media_ref"]: r
        for r in media_resize_features(
            spark.createDataFrame(rows, "media_ref string, blob binary")
        ).collect()
    }
    assert set(got) == {"ok://1", "ok://2"}  # bad blobs skipped, not crashed
    for ref, img in (("ok://1", img1), ("ok://2", img2)):
        h, w = img.shape[0], img.shape[1]
        sy = (np.arange(4) * h) // 4
        sx = (np.arange(4) * w) // 4
        want = img[sy][:, sx]
        assert got[ref]["pixels_csv"] == ",".join(
            map(str, want.reshape(-1).tolist())
        )
        assert got[ref]["r_mean"] == float(want[:, :, 0].mean())
    assert got["ok://2"]["pixels_csv"] == ",".join(
        map(str, img2.reshape(-1).tolist())
    )  # 4x4 -> 4x4 is the identity


def test_frame_sample_numpy_mirror(spark):
    """Frame sampling vs an inline mirror: stride picks 0,3,6,…, the
    per-frame stats come from the right frame slice, corrupt blobs
    skipped, and a video shorter than one stride still yields frame 0."""
    import numpy as np

    from crawler.textops import SVID_MAGIC, frame_sample_features

    def svid(nf, w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, nf * w * h * 3, dtype=np.uint8)
        return (
            SVID_MAGIC + nf.to_bytes(2, "big") + w.to_bytes(2, "big")
            + h.to_bytes(2, "big") + bytes([3]) + px.tobytes()
        ), px.reshape(nf, h, w, 3)

    b1, v1 = svid(7, 5, 4, 1)   # frames 0, 3, 6
    b2, v2 = svid(2, 3, 3, 2)   # shorter than stride: frame 0 only
    rows = [
        ("v://1", bytearray(b1)),
        ("v://2", bytearray(b2)),
        ("bad://magic", bytearray(b"YYYY" + b1[4:])),
        ("bad://short", bytearray(b1[:-5])),
    ]
    got = {}
    for r in frame_sample_features(
        spark.createDataFrame(rows, "media_ref string, blob binary"), stride=3
    ).collect():
        got.setdefault(r["media_ref"], {})[r["frame_idx"]] = r
    assert set(got) == {"v://1", "v://2"}
    assert sorted(got["v://1"]) == [0, 3, 6] and sorted(got["v://2"]) == [0]
    for ref, vid in (("v://1", v1), ("v://2", v2)):
        for f, r in got[ref].items():
            assert r["n_frames"] == vid.shape[0]
            assert r["mean"] == float(vid[f].astype(np.float64).mean())
            assert r["first_byte"] == int(vid[f].reshape(-1)[0])


def test_length_quantiles_matches_numpy(spark):
    """Grouped exact quantiles vs numpy's linear-interpolation
    percentile over the same per-language length populations."""
    import numpy as np

    rows = [
        (i, ("the and is of to " * (3 + i % 7)) if i % 2 else ("zzz " * (5 + i % 11)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["lang_pred"]: r for r in textops.length_quantiles(df).collect()}
    pops = {"en": [], "other": []}
    for _, text in rows:
        toks = text.lower().split(" ")  # split keeps the trailing ''
        sw = {"the", "and", "is", "of", "to"}
        ratio = sum(w in sw for w in toks) / max(len(toks), 1)
        pops["en" if ratio >= 0.08 else "other"].append(len(toks))
    assert set(got) == {k for k, v in pops.items() if v}
    for lang, ns in pops.items():
        if not ns:
            continue
        assert got[lang]["n_docs"] == len(ns)
        for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            want = round(float(np.percentile(ns, p, method="linear")), 6)
            assert got[lang][col] == want, (lang, col)


def test_pii_redact_planted(spark):
    rows = [
        (0, "write to first.last+tag@sub.example.co.uk today"),
        (1, "call +44-207-946-0958 or 555-0100"),  # 2nd: no leading +CC-
        (2, "server at 192.168.0.1 and 10.0.0.255 but not 1.2.3.4.5 stop"),
        (3, "clean text with no pii at all"),
        (4, "two mails a@b.io c@d.org one phone +1-555-123-4567"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.pii_redact(docs).collect()}
    assert out[0]["n_emails"] == 1 and "<EMAIL>" in out[0]["clean_text"]
    assert "first.last" not in out[0]["clean_text"]
    assert out[1]["n_phones"] == 1  # '+1-555-0100' lacks the 2nd group
    assert "<PHONE>" in out[1]["clean_text"]
    # 1.2.3.4.5: \b does NOT block the trailing '.5' (dot is a non-word
    # char), so the quad prefix redacts too — over-redaction by design:
    # excluding it needs lookahead, which RE2 (the oracle engine) lacks,
    # and a privacy scrub errs toward redacting
    assert out[2]["n_ips"] == 3
    assert out[2]["clean_text"] == "server at <IP> and <IP> but not <IP>.5 stop"
    assert out[3]["clean_text"] == rows[3][1]
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 0)
    assert out[4]["n_emails"] == 2 and out[4]["n_phones"] == 1


def test_unigram_lm_score_planted(spark):
    # corpus: a×5, b×3, c×2 → total 10.  doc0 = 'a a b', doc1 = 'c',
    # doc2 = 'a a a b b c'
    rows = [(0, "a a b"), (1, "c"), (2, "a a a b b c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.unigram_lm_score(docs).collect()}
    # doc0: (5+5+3)/(3*10)
    assert out[0]["n_tokens"] == 3 and out[0]["mean_unigram_p"] == 13 / 30
    # doc1: 2/(1*10)
    assert out[1]["mean_unigram_p"] == 0.2
    # doc2: (15+6+2)/(6*10)
    assert out[2]["mean_unigram_p"] == 23 / 60
    # empty/whitespace-only docs drop out (no non-empty tokens)
    empt = spark.createDataFrame([(9, "")], "doc_id long, text string")
    assert textops.unigram_lm_score(docs.unionByName(empt)).where(
        "doc_id = 9"
    ).count() == 0


def test_bigram_lm_planted(spark):
    # bigrams: doc0 a>b, b>a, a>b ; doc1 a>c ; doc2 none (1 token) ;
    # doc3 none (empty text must not throw under ANSI)
    rows = [(0, "a b a b"), (1, "a c"), (2, "solo"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["cnt"], r["p_cond"])
        for r in textops.bigram_lm(docs, k=10).collect()
    }
    # c(a,·)=3 → p(b|a)=2/3, p(c|a)=1/3 ; c(b,·)=1 → p(a|b)=1
    assert got[("a", "b")] == (2, 2 / 3)
    assert got[("a", "c")] == (1, 1 / 3)
    assert got[("b", "a")] == (1, 1.0)
    assert ("solo",) not in {k[:1] for k in got} or True
    assert len(got) == 3


def test_mix_sources_deterministic_weights(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"src0": 1.0, "src1": 0.5, "src3": 0.0}
    out = textops.mix_sources(docs, w, default_weight=1.0)
    kept = {r["doc_id"] for r in out.where("keep").collect()}
    per = {s: sum(1 for i in kept if i % 4 == int(s[3])) for s in
           ("src0", "src1", "src2", "src3")}
    assert per["src0"] == 100      # weight 1.0 keeps everything
    assert per["src3"] == 0        # weight 0.0 keeps nothing
    assert per["src2"] == 100      # default weight
    assert 30 <= per["src1"] <= 70  # ~half, exact set pinned below
    # determinism: same salt → identical verdict set
    again = {r["doc_id"] for r in textops.mix_sources(
        docs, w, default_weight=1.0).where("keep").collect()}
    assert again == kept
    # different salt → a different (but still ~half) src1 sample
    other = {r["doc_id"] for r in textops.mix_sources(
        docs, w, default_weight=1.0, salt="other").where("keep").collect()}
    assert {i for i in other if i % 4 == 0} == {i for i in kept if i % 4 == 0}
    assert {i for i in other if i % 4 == 1} != {i for i in kept if i % 4 == 1}
