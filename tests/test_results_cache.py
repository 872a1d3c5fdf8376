"""Results-cache sink: per-query partitions, idempotent rewrite
(clo/OutputHandler.hpp:121 results-cache analog)."""

from __future__ import annotations

from clp_spark.config import PipelineConfig
from clp_spark.pipeline import compress_df
from clp_spark.search import search
from clp_spark.search.results import has_results, read_results, write_results


def test_results_cache_roundtrip(spark, pages_df, tmp_path):
    enc, lt, vd = compress_df(pages_df.limit(500), PipelineConfig())
    rdir = str(tmp_path / "results")

    m1 = search(enc, lt, vd, "user=alice").select("url", "warc_ts", "text")
    n1 = m1.count()
    qid = write_results(m1, rdir, "user=alice")
    assert has_results(rdir, "user=alice")
    got = read_results(spark, rdir, "user=alice")
    assert got.count() == n1
    assert set(got.select("query_id").distinct().collect()[0]) == {qid}

    # second query lands in its own partition; first is untouched
    m2 = search(enc, lt, vd, "request handled").select("url", "warc_ts", "text")
    write_results(m2, rdir, "request handled")
    assert read_results(spark, rdir, "user=alice").count() == n1
    assert read_results(spark, rdir).count() == n1 + m2.count()

    # idempotent re-run: same partition replaced, not appended
    write_results(m1, rdir, "user=alice")
    assert read_results(spark, rdir, "user=alice").count() == n1
