"""End-to-end training-data preparation job over the sf0.001 corpus."""

import re
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from jobs.prepare_training_data import build_pipeline  # noqa: E402

SF = "/root/testdata/sf0.001"
BUDGET = 128


@pytest.fixture(scope="module")
def pipeline_out(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sampled, packed = build_pipeline(
        spark,
        docs,
        jaccard_threshold=0.5,
        sample_rates={"en": 0.9},
        default_rate=0.7,
        budget=BUDGET,
    )
    return docs, sampled.toPandas(), packed.toPandas()


def test_dedup_invariants(spark, pipeline_out):
    docs, sampled, packed = pipeline_out
    assert 0 < len(sampled) <= docs.count()
    texts = (
        docs.join(
            spark.createDataFrame(sampled[["doc_id"]]), "doc_id", "left_semi"
        )
        .select("doc_id", "text")
        .toPandas()
    )

    def norm(t):
        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()

    normed = texts["text"].map(norm)
    assert normed.nunique() == len(texts), "exact dups survived"

    # no kept pair with bigram jaccard >= threshold
    def grams(t):
        toks = re.findall("[a-z0-9]+", t.lower())
        return {" ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 1))}

    gs = dict(zip(texts["doc_id"], texts["text"].map(grams)))
    ids = sorted(gs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(gs[a] & gs[b])
            if inter:
                j = inter / len(gs[a] | gs[b])
                assert j < 0.5, (a, b, j)


def test_packing_matches_python_reference(pipeline_out):
    _, sampled, packed = pipeline_out
    assert set(packed["doc_id"]) == set(sampled["doc_id"])
    p = packed.sort_values("doc_id").reset_index(drop=True)
    prev = 0
    for r in p.itertuples():
        assert r.bin == prev // BUDGET
        assert r.bin_offset == prev % BUDGET
        prev += r.n_tokens


def test_sampling_is_stratified(pipeline_out):
    _, sampled, _ = pipeline_out
    # decision must be the documented pure function of the id
    import hashlib

    for r in sampled.itertuples():
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) % 1_000_000
        cut = 900_000 if r.lang_pred == "en" else 700_000
        assert h < cut, (r.doc_id, r.lang_pred)


def test_holdout_split_is_leakage_safe(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sampled, packed = build_pipeline(
        spark,
        docs,
        jaccard_threshold=0.5,
        default_rate=1.0,
        budget=BUDGET,
        test_fraction=0.4,
    )
    spdf = sampled.select("doc_id", "source", "split").toPandas()
    # no source straddles the boundary
    assert (spdf.groupby("source")["split"].nunique() <= 1).all()
    assert set(spdf["split"].unique()) <= {"train", "test"}
    # only train docs were packed
    packed_ids = set(packed.toPandas()["doc_id"])
    test_ids = set(spdf.loc[spdf["split"] == "test", "doc_id"])
    assert packed_ids.isdisjoint(test_ids)
    train_ids = set(spdf.loc[spdf["split"] == "train", "doc_id"])
    assert packed_ids == train_ids


def test_chunked_pipeline_units_and_reassembly(spark):
    """chunk_size > 0: chunks become the packed units; every kept doc's
    windows appear with doc-major/window-minor ordering preserved by
    the unit-id packing, and the window text survives to the sink."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sampled, packed = build_pipeline(
        spark, docs, budget=BUDGET, chunk_size=32, chunk_overlap=8
    )
    pk = packed.toPandas()
    assert set(pk.columns) == {
        "doc_id", "chunk_idx", "chunk_text", "n_tokens", "bin", "bin_offset",
    }
    assert (pk["n_tokens"] > 0).all()
    assert pk["chunk_text"].str.len().gt(0).all()
    # chunk windows never exceed the requested size
    assert pk["chunk_text"].str.split(" ").map(len).le(32).all()
    # unit ordering: within a doc, higher chunk_idx packs at equal-or-
    # later position (bin, bin_offset) — doc-major, window-minor
    pk = pk.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pos = pk["bin"] * BUDGET + pk["bin_offset"]
    same_doc = pk["doc_id"].eq(pk["doc_id"].shift())
    assert (pos.diff()[same_doc] >= 0).all()
    # every sampled doc contributed at least one window
    assert set(pk["doc_id"]) == set(sampled.toPandas()["doc_id"])


def test_semantic_dedup_stage(spark):
    """The optional SemDeDup stage drops exactly the semantic_dedup
    drop list (ids present in embeddings), and docs WITHOUT an
    embedding row always pass through (left-anti contract)."""
    from online_centrality_spark.similarity import semantic_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base, _ = build_pipeline(spark, docs, budget=BUDGET)
    semed, _ = build_pipeline(
        spark, docs, budget=BUDGET,
        embeddings=emb, semantic_threshold=0.4,
    )
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    sem_ids = {r["doc_id"] for r in semed.select("doc_id").collect()}
    dropped = {
        r["vec_id"]
        for r in semantic_dedup(emb, k=10, threshold=0.4)
        .filter(~F.col("keep"))
        .collect()
    }
    assert sem_ids == base_ids - dropped
    # embedding-less docs pass through: restrict embeddings to half the
    # id space and confirm the other half is untouched
    half = emb.filter(F.col("vec_id") < 250)
    semed2, _ = build_pipeline(
        spark, docs, budget=BUDGET,
        embeddings=half, semantic_threshold=0.4,
    )
    sem2_ids = {r["doc_id"] for r in semed2.select("doc_id").collect()}
    assert {i for i in base_ids if i >= 250} <= sem2_ids
