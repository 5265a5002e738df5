"""Tests for text-stats, embeddings ANN, and multimodal plumbing."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gnames_spark.functions.multimodal import (
    image_features,
    parse_image_header,
    with_image_meta,
)
from gnames_spark.functions.textstats import (
    langid_heuristic,
    quality_features,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from gnames_spark.operators.embeddings import (
    ann_topk,
    cosine_topk,
    embedding_dup_pairs,
)


class TestTextStats:
    def test_token_count(self, spark):
        df = spark.createDataFrame([("a b  c",), ("",), ("one",)], ["text"])
        got = [r[0] for r in df.select(token_count("text")).collect()]
        assert got == [3, 0, 1]

    def test_langid(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat and the dog is in of to for",),
                ("der hund und die katze ist von zu mit",),
                ("le chat et la maison est pour dans les",),
                ("xyzzy qwerty plugh",),
            ],
            ["text"],
        )
        got = [r[0] for r in df.select(langid_heuristic("text")).collect()]
        assert got == ["en", "de", "fr", "und"]

    def test_quality_features_and_score(self, spark):
        df = spark.createDataFrame([("the quick brown fox and the lazy dog of doom",)], ["text"])
        row = df.select(*quality_features("text"), quality_score("text").alias("q")).collect()[0]
        assert row["n_tokens"] == 10
        assert row["stopword_ratio"] == pytest.approx(0.4)
        assert 0 < row["q"] <= 1

    def test_fingerprint_deterministic_and_substring_stable(self, spark):
        df = spark.createDataFrame(
            [("hello world this is a document",),
             ("hello world this is a document",),
             ("PREFIX hello world this is a document SUFFIX",)],
            ["text"],
        )
        got = [r[0] for r in df.select(rolling_fingerprint("text")).collect()]
        assert got[0] == got[1]
        # winnowing min over windows: the shared core usually dominates;
        # at minimum the fingerprint of the superset is <= (min over more windows)
        assert got[2] <= got[0]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(5)
    base = rng.standard_normal((20, 16))
    # plant: vec 100 ~ vec 101 (near-identical), others random
    rows = [(100, base[0].tolist()), (101, (base[0] + 0.01 * base[1]).tolist())]
    rows += [(200 + i, base[i].tolist()) for i in range(2, 20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


class TestEmbeddings:
    def test_cosine_topk_exact(self, spark, vectors):
        res = cosine_topk(vectors, vectors, k=3)
        by_query = {}
        for r in res.collect():
            by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
        top1_100 = sorted(by_query[100])[0]
        assert top1_100[1] == 101 and top1_100[2] > 0.99
        assert all(len(v) == 3 for v in by_query.values())

    def test_cosine_topk_matches_numpy(self, spark, vectors):
        rows = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
        res = cosine_topk(vectors, vectors, k=1).collect()
        for r in res:
            q = rows[r["query_id"]]
            best_id, best_cos = None, -2
            for vid, v in rows.items():
                if vid == r["query_id"]:
                    continue
                c = round(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 6)
                if c > best_cos or (c == best_cos and vid < best_id):
                    best_id, best_cos = vid, c
            assert (r["neighbor_id"], r["cosine"]) == (best_id, pytest.approx(best_cos))

    def test_embedding_dup_pairs(self, spark, vectors):
        pairs = embedding_dup_pairs(vectors, threshold=0.99).collect()
        assert {(p["id_a"], p["id_b"]) for p in pairs} == {(100, 101)}

    def test_ann_finds_planted_pair(self, spark, vectors):
        res = ann_topk(vectors, dim=16, k=3, n_bits=4, seed=1)
        got = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}
        # near-identical vectors share every hyperplane bucket
        assert (100, 101) in got and (101, 100) in got


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x00" * 5
    )


class TestMultimodal:
    def test_parse_png_gif(self):
        assert parse_image_header(_png(640, 480))[:3] == ("png", 640, 480)
        gif = b"GIF89a" + struct.pack("<HH", 10, 20)
        assert parse_image_header(gif)[:3] == ("gif", 10, 20)
        assert parse_image_header(b"")[0] is None
        assert parse_image_header(b"garbage")[0] == "unknown"

    def test_meta_udf_and_features(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(_png(64, 32))), (2, bytearray(b"\x00\x01\x02" * 100))],
            "id long, media binary",
        )
        meta = {r["id"]: r["media_meta"] for r in with_image_meta(df).collect()}
        assert meta[1]["format"] == "png" and meta[1]["width"] == 64
        feats = image_features(df, fake=True, dim=4)
        rows = {r["id"]: r["features"] for r in feats.collect()}
        assert len(rows[1]) == 4 and abs(sum(rows[2]) - 1.0) < 1e-9
        assert "media" not in feats.columns  # blob dropped before shuffle

    def test_real_decode_raises(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, media binary")
        with pytest.raises(Exception, match="NotImplementedError|image decode"):
            image_features(df, fake=False).collect()
