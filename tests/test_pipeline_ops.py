"""Training-data pipeline operators vs independent python recomputation."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from online_centrality_spark.dedup import (
    dedup_clusters,
    embedding_near_dups,
    exact_dedup,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dups,
)
from online_centrality_spark.multimodal import (
    decode_media,
    extract_features,
    generate_fake_media,
    resize_images,
    sample_frames,
)
from online_centrality_spark.similarity import brute_force_topk, lsh_topk
from online_centrality_spark.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)


def py_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
    (3, "completely different content about spark engines and shuffles"),
    (4, "der hund und die katze sind nicht da und das ist gut"),
    (5, "le chat est une belle creature et la vie est bonne"),
    (6, "spark engines and shuffles completely different content about"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs_df):
    groups = exact_duplicate_groups(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0
    kept = sorted(r["doc_id"] for r in exact_dedup(docs_df).collect())
    assert kept == [0, 2, 3, 4, 5, 6]


def py_shingles(text, n=3):
    toks = re.findall("[a-z0-9]+", text.lower())
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))}


def test_ngram_jaccard(spark, docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, threshold=0.0).collect()
    }
    sh = {i: py_shingles(t) for i, t in DOCS}
    for i in sh:
        for j in sh:
            if i < j and sh[i] & sh[j]:
                want = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
                assert got[(i, j)] == pytest.approx(want, abs=1e-12)
    assert (0, 1) in got and got[(0, 1)] == pytest.approx(1.0)


def test_ngram_containment(spark, docs_df):
    from online_centrality_spark.dedup import ngram_containment_pairs

    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in ngram_containment_pairs(docs_df, threshold=0.0).collect()
    }
    sh = {i: py_shingles(t) for i, t in DOCS}
    for i in sh:
        for j in sh:
            if i != j and sh[i] & sh[j]:
                want = len(sh[i] & sh[j]) / len(sh[i])
                assert got[(i, j)] == pytest.approx(want, abs=1e-12)
    # every candidate pair appears in BOTH directions
    assert all((b, a) in got for a, b in got)


def test_containment_catches_subdocument_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted inside a much
    longer one scores near-zero Jaccard but 1.0 containment in the
    short->long direction (and only that direction)."""
    import pandas as pd

    from online_centrality_spark.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    para = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"word{i} filler{i} token{i}" for i in range(60))
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, para), (1, filler + " " + para + " " + filler)],
            columns=["doc_id", "text"],
        )
    )
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    }
    assert jac[(0, 1)] < 0.1  # symmetric measure: invisible
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    }
    assert cont == {(0, 1): pytest.approx(1.0)}  # directed: caught, one way


def test_minhash_signatures_and_lsh(spark, docs_df):
    k = 8
    sig = minhash_signatures(docs_df, k=k).collect()
    got = {(r["doc_id"], r["i"]): r["minhash"] for r in sig}
    for doc_id, text in DOCS:
        grams = py_shingles(text)
        for i in range(k):
            want = min(py_hash(f"{g}#{i}") for g in grams)
            assert got[(doc_id, i)] == want
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs_df, k=8, num_bands=4).collect()
    }
    assert (0, 1) in cand  # exact dups always collide in every band
    assert (0, 3) not in cand  # unrelated docs shouldn't


def py_simhash(text, bits=32):
    toks = re.findall("[a-z0-9]+", text.lower())
    acc = np.zeros(bits)
    for t in toks:
        h = py_hash(t)
        for b in range(bits):
            acc[b] += 1 if (h >> b) & 1 else -1
    return sum(2**b for b in range(bits) if acc[b] >= 0)


def test_simhash(spark, docs_df):
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs_df).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_simhash(text), doc_id
    dups = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dups(docs_df, max_hamming=32).collect()
    }
    assert dups.get((0, 1)) == 0
    # doc 6 is a token-permutation of doc 3 -> identical simhash (bag model)
    assert dups.get((3, 6)) == 0


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    vecs[7] = vecs[3] * 2.0  # same direction -> cosine 1
    pdf = pd.DataFrame({"vec_id": range(20), "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def py_cosine(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_embedding_near_dups(spark, emb_df):
    df, vecs = emb_df
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in embedding_near_dups(df, threshold=0.99).collect()
    }
    assert got.keys() == {(3, 7)}
    assert got[(3, 7)] == pytest.approx(1.0, abs=1e-9)


def test_brute_force_topk(spark, emb_df):
    df, vecs = emb_df
    k = 5
    got = brute_force_topk(df, df, k=k).toPandas()
    for q in range(20):
        sims = sorted(
            ((py_cosine(vecs[q], vecs[i]), -i) for i in range(20) if i != q),
            reverse=True,
        )[:k]
        want_ids = [-i for _, i in sims]
        got_ids = got[got["query_id"] == q].sort_values("rank")["item_id"].tolist()
        assert got_ids == want_ids, q


def test_lsh_topk_subset_of_exact(spark, emb_df):
    df, vecs = emb_df
    approx = lsh_topk(df, df, k=3, num_tables=6, num_planes=4).toPandas()
    # scored candidates carry exact cosine values
    for r in approx.itertuples():
        assert r.cosine == pytest.approx(
            py_cosine(vecs[r.query_id], vecs[r.item_id]), abs=1e-9
        )
    # identical-direction pair always collides in every table
    q3 = approx[approx["query_id"] == 3]
    assert 7 in q3["item_id"].tolist()


def test_text_analysis(spark, docs_df):
    tok = {r["doc_id"]: r["n_tokens"] for r in token_count(docs_df).collect()}
    for doc_id, text in DOCS:
        want = len(re.findall(r"[a-z0-9]+|[^a-z0-9\s]+", text.lower()))
        assert tok[doc_id] == want
    lang = {r["doc_id"]: r["lang_pred"] for r in language_id(docs_df).collect()}
    assert lang[0] == "en" and lang[4] == "de" and lang[5] == "fr"
    q = quality_score(docs_df).toPandas().set_index("doc_id")
    assert (q["quality"] >= 0).all() and (q["quality"] <= 1).all()
    row = q.loc[0]
    n_words = len(re.findall("[a-z0-9]+", DOCS[0][1]))
    assert row["n_words"] == n_words
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in document_fingerprint(docs_df).collect()
    }
    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", DOCS[0][1].lower())).strip()
    assert fp[0] == py_hash(norm)
    assert fp[0] == fp[1] and fp[0] != fp[3]


def test_multimodal_plumbing(spark):
    media = generate_fake_media(spark, n=18, seed=1)
    dec = decode_media(media).toPandas().set_index("media_id")
    src = media.toPandas().set_index("media_id")
    assert len(dec) == 18
    for mid in src.index:
        if src.loc[mid, "kind"] == "image":
            assert dec.loc[mid, "width"] == src.loc[mid, "width"]
            assert dec.loc[mid, "n_bytes"] == src.loc[mid, "width"] * src.loc[mid, "height"]
    feats = extract_features(media).toPandas()
    assert len(feats) == 18
    for f in feats["features"]:
        assert len(f) == 8 and abs(sum(f) - 1.0) < 1e-9
    resized = resize_images(media, 4, 4).toPandas()
    assert (resized["width"] == 4).all() and (resized["height"] == 4).all()
    rdec = decode_media(spark.createDataFrame(resized)).toPandas()
    assert (rdec["n_bytes"] == 16).all()
    frames = sample_frames(media, every_k=2).toPandas()
    n_videos = (src["kind"] == "video").sum()
    want_frames = sum(
        len(range(0, int(src.loc[m, "n_frames"]), 2))
        for m in src.index
        if src.loc[m, "kind"] == "video"
    )
    assert len(frames) == want_frames and frames["media_id"].nunique() == n_videos


def test_unknown_format_raises(spark):
    bad = spark.createDataFrame(
        [(0, "image", bytearray(b"JPEGDATA..."), 1, 1, 1)],
        schema=generate_fake_media(spark, 1).schema,
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKE"):
        decode_media(bad).collect()


def test_embedding_near_dups_lsh_matches_all_pairs(spark):
    """The bucketed near-dup path returns EXACTLY the all-pairs result on
    the sf fixture (recall 1.0 at 24 tables x 4 planes, precision 1.0 by
    construction: candidates are verified on the exact cosine)."""
    from online_centrality_spark.dedup import embedding_near_dups_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.doc_a, r.doc_b): r.cosine
        for r in embedding_near_dups(emb, threshold=0.4).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in embedding_near_dups_lsh(
            emb, threshold=0.4, num_tables=24, num_planes=4
        ).collect()
    }
    assert got.keys() == exact.keys()
    for k, v in exact.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_embedding_near_dups_blocked_matches_all_pairs(spark):
    """The blocked distributed exact path (one Arrow task per block
    pair, no driver collect) returns the SAME pair set as the all-pairs
    twin, values equal to 1 ulp — i.e. identical after the query
    surface's round(·, 6). Checked at two block counts, including one
    larger than the row-hash spread, to exercise empty block pairs."""
    from online_centrality_spark.dedup import embedding_near_dups_blocked

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.doc_a, r.doc_b): r.cosine
        for r in embedding_near_dups(emb, threshold=0.4).collect()
    }
    for nb in (4, 13):
        got = {
            (r.doc_a, r.doc_b): r.cosine
            for r in embedding_near_dups_blocked(
                emb, threshold=0.4, num_blocks=nb
            ).collect()
        }
        assert got.keys() == exact.keys(), nb
        for k, v in exact.items():
            assert got[k] == pytest.approx(v, abs=1e-14), (nb, k)


def test_cos_edges_never_collects_embeddings(spark, monkeypatch):
    """The similarity graph feeding the 14 contract graph queries must be
    built without a driver hop: building AND executing _cos_edges may
    not call toPandas (the old all-pairs source collected + broadcast
    the full matrix — the 100 TB scale-killer, VERDICT r03 #1)."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from pyspark.sql import DataFrame

    def _forbidden(self, *a, **kw):
        raise AssertionError("toPandas called while building _cos_edges")

    monkeypatch.setattr(DataFrame, "toPandas", _forbidden)
    edges = entry_mod._cos_edges(spark, "/root/testdata/sf0.001")
    n = edges.count()
    assert n > 0
    monkeypatch.undo()
    # and the result matches the all-pairs construction of the same graph
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import pyspark.sql.functions as F

    want = {
        (r.doc_a, r.doc_b)
        for r in embedding_near_dups(emb, threshold=entry_mod.COS_TH - 1e-6)
        .select("doc_a", "doc_b", F.round("cosine", 6).alias("c"))
        .filter(F.col("c") >= entry_mod.COS_TH)
        .collect()
    }
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == want


def test_ivf_topk(spark):
    """IVF coarse-quantizer ANN: probing ALL cells reproduces the exact
    brute-force top-k; probing a fraction keeps high recall on the
    fixture (deterministic seeded training)."""
    from online_centrality_spark.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(emb.vec_id < 30)
    want = {
        (r.query_id, r.rank): r.item_id
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    full = {
        (r.query_id, r.rank): r.item_id
        for r in ivf_topk(
            emb, queries, k=5, n_cells=16, n_probe=16
        ).collect()
    }
    assert full == want  # n_probe == n_cells -> exact
    part = {
        (r.query_id, r.rank): r.item_id
        for r in ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6).collect()
    }
    hit = sum(part.get(k) == v for k, v in want.items()) / len(want)
    # random-ish 64-dim fixture has weak cluster structure: recall at
    # 6/16 probes is ~0.5 (above the 0.375 probed-fraction baseline);
    # deterministic seeds make this stable
    assert hit >= 0.45, hit


def test_dedup_clusters(spark, docs_df):
    """Pairs -> transitive clusters -> canonical doc = min id; singletons
    keep themselves.  Chain 0-1 (exact dup) + 1-2 (near dup) must merge
    into ONE cluster even though (0, 2) alone is below the threshold."""
    pairs = ngram_jaccard_pairs(docs_df, n=2, threshold=0.4)
    got = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_clusters(docs_df, pairs).collect()
    }
    assert len(got) == 7
    # 0-1 jaccard = 1.0; 1-2 above 0.4; 0-2 transitive via 1
    assert got[0] == (0, 1) and got[1] == (0, 0) and got[2] == (0, 0)
    # 6 is a token permutation of 3: bigram jaccard 0.75 -> same cluster
    assert got[3] == (3, 1) and got[6] == (3, 0)
    # singletons are their own cluster and kept
    for d in (4, 5):
        assert got[d] == (d, 1), (d, got[d])
    # a custom pair frame with extra columns and different names
    extra = spark.createDataFrame(
        pd.DataFrame({"left": [3], "right": [6], "score": [0.9]})
    )
    got2 = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_clusters(docs_df, extra, pair_cols=("left", "right")).collect()
    }
    assert got2[3] == (3, 1) and got2[6] == (3, 0)


def test_pack_sequences(spark):
    from online_centrality_spark.text import pack_sequences

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{j}" for j in range(int(n)))
        for n in rng.integers(1, 40, size=60)
    ]
    pdf = pd.DataFrame({"doc_id": range(100, 160), "text": texts})
    docs = spark.createDataFrame(pdf).repartition(7)
    budget = 64
    got = (
        pack_sequences(docs, budget=budget, num_buckets=5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # python reference: greedy sequential fill in id order
    n_tok = {i: len(re.findall(r"[a-z0-9]+|[^a-z0-9\s]+", t.lower()))
             for i, t in zip(pdf["doc_id"], pdf["text"])}
    prev = 0
    for r in got.itertuples():
        assert r.n_tokens == n_tok[r.doc_id]
        assert r.bin == prev // budget
        assert r.bin_offset == prev % budget
        prev += r.n_tokens
    # bucketing is an internal detail: same result at any bucket count
    got1 = (
        pack_sequences(docs, budget=budget, num_buckets=1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(got1)


def test_hash_sample(spark, docs_df):
    from online_centrality_spark.dedup.common import portable_hash
    from online_centrality_spark.text import hash_sample

    # uniform: decision is a pure function of the id
    kept = {r["doc_id"] for r in hash_sample(docs_df, 0.5).collect()}
    want = {
        i for i, _ in DOCS if py_hash(str(i)) % 1_000_000 < 500_000
    }
    assert kept == want
    # rerun => identical keep set
    assert {r["doc_id"] for r in hash_sample(docs_df, 0.5).collect()} == kept
    # stratified: per-stratum cutoffs, default applies to unlisted strata
    from pyspark.sql import functions as F

    with_lang = docs_df.withColumn(
        "s", F.when(F.col("doc_id") < 3, "a").otherwise("b")
    )
    got = {
        r["doc_id"]
        for r in hash_sample(
            with_lang, fraction=0.0, stratum_col="s", fractions={"a": 1.0}
        ).collect()
    }
    assert got == {0, 1, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_sample(docs_df)
    with _pytest.raises(ValueError):
        hash_sample(docs_df, fractions={"a": 1.0})


def test_redact_pii(spark):
    from online_centrality_spark.text import redact_pii

    rows = [
        (0, "contact me at alice.smith+x@example.co.uk or bob@test.io today"),
        (1, "call +1 (555) 123-4567 now"),
        (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["text_redacted"] == "contact me at <EMAIL> or <EMAIL> today"
    assert got[0]["n_redactions"] == 2
    assert got[1]["text_redacted"] == "call <PHONE> now"
    assert got[1]["n_redactions"] == 1
    assert got[2]["text_redacted"] == "server at <IP> and <IP> responded"
    assert got[2]["n_redactions"] == 2
    assert got[3]["text_redacted"] == rows[3][1] and got[3]["n_redactions"] == 0


def test_decontaminate(spark):
    from online_centrality_spark.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content with different words entirely"),
            (3, "a quick brown fox appeared in the garden yesterday"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "someone saw the quick brown fox near here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_contaminated"], r["contaminated"])
        for r in decontaminate(docs, bench, n=3).collect()
    }
    # doc 1 shares 'the quick brown' + 'quick brown fox'; doc 3 shares
    # 'quick brown fox'; doc 2 shares nothing
    assert out[1] == (2, 1)
    assert out[3] == (1, 1)
    assert out[2] == (0, 0)


def test_gopher_rules(spark):
    from online_centrality_spark.text import gopher_rules

    good = (
        "the sun rose over the valley and the town woke to a clear morning "
        "in which every street market is open and the people of the town "
        "walk to work in the mild air of early autumn"
    )
    bullets = "\n".join(f"- item {i}" for i in range(10))
    symbols = "# " * 30 + "word"
    rows = [(1, good), (2, bullets), (3, symbols), (4, "short text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[1]["gopher_pass"] == 1
    assert out[2]["bullet_line_ratio"] == 1.0 and out[2]["gopher_pass"] == 0
    assert out[3]["symbol_word_ratio"] > 0.1 and out[3]["gopher_pass"] == 0
    assert out[4]["n_words"] < 10 and out[4]["gopher_pass"] == 0


def test_domain_mixture_weights(spark):
    from online_centrality_spark.text import domain_mixture_weights

    df = spark.createDataFrame(
        [("en", 300), ("en", 300), ("de", 200), ("fr", 200)],
        "lang string, n_tokens long",
    )
    out = {
        r["stratum"]: r.asDict()
        for r in domain_mixture_weights(
            df, "lang", {"en": 0.5, "de": 0.5}
        ).collect()
    }
    assert out["en"]["stratum_tokens"] == 600
    assert out["en"]["share"] == pytest.approx(0.6)
    assert out["en"]["weight"] == pytest.approx(0.5 / 0.6)
    assert out["de"]["weight"] == pytest.approx(0.5 / 0.2)
    # stratum missing from the target mixture gets weight 0
    assert out["fr"]["target_share"] == 0.0 and out["fr"]["weight"] == 0.0
    # cap applies
    capped = {
        r["stratum"]: r["weight"]
        for r in domain_mixture_weights(
            df, "lang", {"de": 1.0}, cap=3.0
        ).collect()
    }
    assert capped["de"] == 3.0


def test_actor_transition_counts(spark):
    from online_centrality_spark.sources import actor_transition_counts

    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(0, "user"), (1, "assistant"), (2, "tool:web")],
        "node_id long, actor string",
    )
    out = {
        (r["src_actor"], r["dst_actor"]): r["n_edges"]
        for r in actor_transition_counts(edges, nodes).collect()
    }
    assert out[("user", "assistant")] == 2
    assert out[("assistant", "tool:web")] == 1
    assert out[("tool:web", "user")] == 1
    assert len(out) == 3


def test_repetition_rules(spark):
    from online_centrality_spark.text import repetition_rules

    varied = " ".join(f"w{i:02d}" for i in range(40))
    rows = [
        (1, "aaa bbb\naaa bbb\nccc"),
        (2, varied),
        (3, "spam spam spam spam spam spam"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in repetition_rules(df).collect()}
    # doc 1: line 'aaa bbb' repeats (3 lines, 2 distinct); 2-gram
    # 'aaa bbb' covers 14 of 28 count-weighted gram chars
    assert out[1]["dup_line_frac"] == pytest.approx(1 / 3)
    assert out[1]["dup_line_char_frac"] == pytest.approx(14 / 17)
    assert out[1]["top_2gram_char_frac"] == pytest.approx(0.5)
    assert out[1]["rep_pass"] == 0
    # doc 2: 40 distinct equal-length words -> uniform gram mass
    assert out[2]["top_2gram_char_frac"] == pytest.approx(1 / 39)
    assert out[2]["dup_5gram_char_frac"] == 0.0
    assert out[2]["rep_pass"] == 1
    # doc 3: one word repeated -> total gram concentration
    assert out[3]["top_2gram_char_frac"] == 1.0
    assert out[3]["dup_5gram_char_frac"] == 1.0
    assert out[3]["rep_pass"] == 0
    # doc 4: empty -> zero metrics, passes vacuously
    assert out[4]["dup_line_frac"] == 0.0 and out[4]["rep_pass"] == 1


def test_sessionize(spark):
    from datetime import datetime

    from online_centrality_spark.streaming import session_stats, sessionize

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    rows = [
        (1, ts(0), 1.0),
        (1, ts(5), 2.0),   # merges (< 10 min gap)
        (1, ts(15), 3.0),  # exactly 10 min -> still merges (inclusive)
        (2, ts(0), 4.0),
        (2, ts(30), 5.0),  # > gap -> new session
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    sess = sessionize(ev, gap_minutes=10.0)
    got = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in sess.collect()
    )
    assert got == [(1, 3, 6.0), (2, 1, 4.0), (2, 1, 5.0)]
    stats = {r["user_id"]: r.asDict() for r in session_stats(sess).collect()}
    assert stats[1]["n_sessions"] == 1 and stats[1]["total_events"] == 3
    assert stats[2]["mean_session_events"] == 1.0


def test_duplicated_spans_handmade(spark):
    """Hand-checkable ExactSubstr removal: docs 0/1 share 'a b c d e';
    doc 2 shares nothing 5-gram-long; short doc produces no grams."""
    from online_centrality_spark.dedup import remove_duplicated_spans

    rows = [
        (0, "a b c d e x y z w v"),
        (1, "q r a b c d e s t u"),
        (2, "one two three four five six seven"),
        (3, "tiny doc"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(df, n=5, min_count=2).collect()
    }
    assert out[0]["n_dup_tokens"] == 5
    assert out[0]["clean_text"] == "x y z w v"
    assert out[1]["n_dup_tokens"] == 5
    assert out[1]["clean_text"] == "q r s t u"
    assert out[2]["n_dup_tokens"] == 0
    assert out[2]["clean_text"] == "one two three four five six seven"
    assert out[3]["n_tokens"] == 2 and out[3]["n_dup_tokens"] == 0
    assert abs(out[0]["dup_frac"] - 0.5) < 1e-9


def test_duplicated_spans_within_doc_repeat(spark):
    """min_count counts total occurrences: a 5-gram repeated twice
    INSIDE one doc is duplicated even with no cross-doc twin."""
    from online_centrality_spark.dedup import remove_duplicated_spans

    rows = [(0, "a b c d e f a b c d e f"), (1, "unrelated words only here")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(df, n=5, min_count=2).collect()
    }
    # every position of doc 0 is covered by some repeated 5-gram
    assert out[0]["n_dup_tokens"] == 12 and out[0]["clean_text"] == ""
    assert out[1]["n_dup_tokens"] == 0


def _planted_vectors():
    """3 planted clusters at distance ~10, tiny deterministic jitter."""
    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])
    rows = []
    for i in range(30):
        c = i % 3
        v = centers[c] + rng.normal(scale=0.1, size=3)
        rows.append((i, [float(x) for x in v], c))
    return rows


def test_kmeans_recovers_planted_clusters(spark):
    from online_centrality_spark.similarity import kmeans

    rows = _planted_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = kmeans(df, k=3, iters=5).toPandas().sort_values("vec_id")
    truth = np.array([r[2] for r in rows])
    got = out.cluster.to_numpy()
    # permutation-invariant: every planted cluster maps to exactly one
    # found cluster and the partition is identical
    mapping = {}
    for t, g in zip(truth, got):
        mapping.setdefault(t, g)
        assert mapping[t] == g
    assert len(set(mapping.values())) == 3
    assert (out.sq_dist < 1.0).all()


def test_kmeans_arrow_assignment_matches_expr(spark):
    from online_centrality_spark.similarity import kmeans

    rows = _planted_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    a = kmeans(df, k=3, iters=4, arrow=False).toPandas().sort_values("vec_id")
    b = kmeans(df, k=3, iters=4, arrow=True).toPandas().sort_values("vec_id")
    assert (a.cluster.values == b.cluster.values).all()
    assert np.allclose(a.sq_dist.values, b.sq_dist.values, atol=1e-6)


def test_kmeans_matches_duckdb_oracle_fixture(spark):
    """Exact cross-engine parity on the real embeddings table shape."""
    import duckdb

    from online_centrality_spark.similarity import kmeans, kmeans_sql

    items = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(items.select("embedding").first()[0])
    out = kmeans(items, k=5, iters=3).orderBy("vec_id").toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "'/root/testdata/sf0.001/embeddings.parquet'"
    )
    odf = con.sql(kmeans_sql(k=5, iters=3, dim=dim) + " ORDER BY vec_id").df()
    assert (out.vec_id.values == odf.vec_id.values).all()
    assert (out.cluster.values == odf.cluster.values).all()
    assert (out.sq_dist.values == odf.sq_dist.values).all()


def test_tfidf_top_terms(spark, docs_df):
    import math

    from online_centrality_spark.text.analysis import tfidf_top_terms

    out = tfidf_top_terms(docs_df, k=3).toPandas()
    # per-doc cap + rank contiguity
    for _, g in out.groupby("doc_id"):
        assert len(g) <= 3
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1))
    # independent recomputation for doc 3
    tokens = [d[1].lower().split() for d in DOCS]
    n = len(DOCS)
    tf3 = {t: tokens[3].count(t) for t in set(tokens[3])}
    df = {t: sum(1 for ts in tokens if t in ts) for t in tf3}
    want = sorted(
        ((round(tf3[t] * math.log(n / df[t]), 6), t) for t in tf3),
        key=lambda x: (-x[0], x[1]),
    )[:3]
    got = out[out["doc_id"] == 3].sort_values("rnk")
    assert [(r.score, r.term) for r in got.itertuples()] == want


def test_term_cooccurrence(spark, docs_df):
    import math

    from online_centrality_spark.text.analysis import term_cooccurrence

    out = {
        (r.term_a, r.term_b): (r.n_pair, r.pmi)
        for r in term_cooccurrence(
            docs_df, vocab_size=100, min_pair_count=2
        ).collect()
    }
    # 'quick' and 'brown' co-occur in docs 0,1,2; df both 3; n=7
    n_pair, pmi = out[("brown", "quick")]
    assert n_pair == 3
    assert pmi == round(math.log((3 * 7) / (3 * 3)), 6)
    assert all(a < b for a, b in out)
    assert all(np >= 2 for np, _ in out.values())


def test_token_percentiles(spark, docs_df):
    import numpy as np

    from online_centrality_spark.text.analysis import token_percentiles

    docs = docs_df.withColumn(
        "lang", docs_df["doc_id"].cast("string")
    ).replace({"4": "de", "5": "fr"}, subset=["lang"])
    out = token_percentiles(docs).toPandas()
    alls = out[out["lang"] == "all"].set_index("p")["n_tokens"]
    counts = np.array(
        [len(re.findall(r"[a-z0-9]+|[^a-z0-9\s]+", t.lower())) for _, t in DOCS],
        dtype=float,
    )
    for p in (0.1, 0.5, 0.9):
        # numpy 'linear' interpolation == Spark percentile == quantile_cont
        assert alls[p] == round(float(np.quantile(counts, p)), 6), p


def test_daily_activity(spark):
    import datetime

    from online_centrality_spark.sources.transcripts import daily_activity

    rows = []
    base = datetime.datetime(2026, 1, 1)
    # 10 days, i+1 events on day i, users cycle mod 3
    for i in range(10):
        for j in range(i + 1):
            rows.append((base + datetime.timedelta(days=i, hours=j), j % 3))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = (
        daily_activity(df, window_days=7)
        .orderBy("day")
        .toPandas()
        .set_index(out_col := "day", drop=False)
    )
    assert len(out) == 10
    assert out["n_events"].tolist() == list(range(1, 11))
    assert out["n_users"].tolist() == [min(i + 1, 3) for i in range(10)]
    want_roll = [
        sum(k + 1 for k in range(max(0, i - 6), i + 1)) for i in range(10)
    ]
    assert out["rolling_events"].tolist() == want_roll


def test_cms_heavy_hitters(spark, docs_df):
    from collections import Counter

    from online_centrality_spark.text.sketches import cms_heavy_hitters

    out = cms_heavy_hitters(docs_df, width=1024, depth=4, k=10).toPandas()
    counts = Counter(
        t for _, text in DOCS for t in re.findall("[a-z0-9]+", text.lower())
    )
    want_top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = out.set_index("token")
    assert set(got.index) == {t for t, _ in want_top}
    for t, n in want_top:
        assert got.loc[t, "n_true"] == n
        # count-min never underestimates; at this width, no collisions
        assert got.loc[t, "n_est"] >= n

    # tiny width forces collisions -> estimates strictly dominate
    tiny = cms_heavy_hitters(docs_df, width=4, depth=2, k=10).toPandas()
    assert (tiny["n_est"] >= tiny["n_true"]).all()
    assert (tiny["n_est"] > tiny["n_true"]).any()


def test_cluster_silhouette_planted_and_numpy_parity(spark):
    """Well-separated planted clusters score near 1; every per-cluster
    mean matches a from-scratch numpy simplified-silhouette rebuild."""
    from online_centrality_spark.similarity import cluster_silhouette, kmeans

    rows = _planted_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        r["cluster"]: (r["n"], r["silhouette"])
        for r in cluster_silhouette(df, k=3, iters=5).collect()
    }
    assert sum(n for n, _ in got.values()) == 30
    assert all(s > 0.9 for _, s in got.values()), got

    # numpy rebuild against the SAME final centroids (recovered from the
    # engine's own assignment: cluster means of the planted points after
    # convergence equal the engine's rounded means to float tolerance)
    asg = kmeans(df, k=3, iters=5).toPandas().sort_values("vec_id")
    X = np.array([r[1] for r in rows], dtype=np.float64)
    cl = asg.cluster.to_numpy()
    cents = np.stack([X[cl == c].mean(axis=0) for c in sorted(set(cl))])
    d = np.sqrt(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    a = d[np.arange(len(X)), cl]
    dd = d.copy()
    dd[np.arange(len(X)), cl] = np.inf
    b = dd.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    for c in sorted(set(cl)):
        want = s[cl == c].mean()
        assert got[c][1] == pytest.approx(want, abs=1e-5)


def test_cluster_silhouette_requires_k2(spark):
    from online_centrality_spark.similarity import cluster_silhouette

    with pytest.raises(ValueError):
        cluster_silhouette(spark.range(1), k=1)


def test_cluster_silhouette_plan_is_scan_plus_one_agg(spark):
    """Scale pin: the silhouette frame is a scan-stage projection plus
    ONE hash-aggregate exchange — no join, no Python."""
    from online_centrality_spark.similarity import cluster_silhouette

    rows = _planted_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cluster_silhouette(df, k=3, iters=2)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
