"""Training-window chunking (functions/chunking.py)."""

from __future__ import annotations

import pytest

from gnames_spark.functions.chunking import chunk_docs, chunk_windows


def _text(n):
    return " ".join(f"t{i}" for i in range(n))


class TestChunking:
    def _chunks(self, spark, n_tokens, chunk, stride):
        df = spark.createDataFrame([(1, _text(n_tokens))], ["doc_id", "text"])
        rows = chunk_docs(df, chunk, stride).orderBy("chunk_id").collect()
        return [(r.chunk_id, r.n_tokens, r.chunk_text) for r in rows]

    def test_non_overlapping_exact_multiple(self, spark):
        got = self._chunks(spark, 8, 4, 4)
        assert [(c, n) for c, n, _ in got] == [(0, 4), (1, 4)]
        assert got[0][2] == "t0 t1 t2 t3" and got[1][2] == "t4 t5 t6 t7"

    def test_partial_tail_kept(self, spark):
        got = self._chunks(spark, 10, 4, 4)
        assert [(c, n) for c, n, _ in got] == [(0, 4), (1, 4), (2, 2)]
        assert got[2][2] == "t8 t9"

    def test_overlap_stride(self, spark):
        got = self._chunks(spark, 10, 4, 2)
        # windows start at 0,2,4,6: last one (t6..t9) reaches the end
        assert [(c, n) for c, n, _ in got] == [(0, 4), (1, 4), (2, 4), (3, 4)]
        assert got[1][2] == "t2 t3 t4 t5"
        # every token appears in some window (no dropped tail)
        covered = set()
        for _, _, t in got:
            covered.update(t.split())
        assert covered == {f"t{i}" for i in range(10)}

    def test_short_doc_single_window(self, spark):
        got = self._chunks(spark, 3, 8, 8)
        assert got == [(0, 3, "t0 t1 t2")]

    def test_empty_doc_no_rows(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
        assert chunk_docs(df, 4).count() == 0

    def test_invalid_stride_rejected(self):
        with pytest.raises(ValueError):
            chunk_windows("text", 4, 8)  # stride > chunk would skip tokens
        with pytest.raises(ValueError):
            chunk_windows("text", 4, 0)

    def test_no_python_no_shuffle_plan(self, spark):
        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = (
            chunk_docs(df, 4, 2)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Exchange" not in plan
