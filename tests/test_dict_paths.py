"""The driver-side (small) and distributed dictionary builds must
produce identical value-sorted-rank dictionaries — the fast path is an
optimization, never a semantic fork."""

from __future__ import annotations

from clp_spark.dicts.build import (
    build_dicts_small,
    build_logtype_dict,
    build_var_dict,
)
from clp_spark.parse.tokenizer import tokenize_df


def test_small_and_distributed_dicts_identical(spark, pages_df):
    parsed = tokenize_df(pages_df).persist()

    lt_df, v_df, lt_map, v_map = build_dicts_small(parsed)
    lt_dist = build_logtype_dict(parsed, num_partitions=5)
    v_dist = build_var_dict(parsed, num_partitions=5)

    got_lt = {
        (r["logtype_id"], r["logtype"], r["num_vars"], r["n_rows"])
        for r in lt_df.collect()
    }
    want_lt = {
        (r["logtype_id"], r["logtype"], r["num_vars"], r["n_rows"])
        for r in lt_dist.collect()
    }
    assert got_lt == want_lt

    got_v = {(r["var_id"], r["value"]) for r in v_df.collect()}
    want_v = {(r["var_id"], r["value"]) for r in v_dist.collect()}
    assert got_v == want_v

    # maps agree with the DataFrames
    assert lt_map == {r["logtype"]: r["logtype_id"] for r in lt_df.collect()}
    assert v_map == {r["value"]: r["var_id"] for r in v_df.collect()}
    parsed.unpersist()


def test_encode_paths_identical(spark, pages_df):
    """Broadcast-map encode and explode/join/regroup encode must produce
    row-identical results — the join path is the 10^12-scale route."""
    from clp_spark.dicts.build import encode_with_dicts, encode_with_maps

    parsed = tokenize_df(pages_df).persist()
    lt_df, v_df, lt_map, v_map = build_dicts_small(parsed)
    a = encode_with_maps(parsed, lt_map, v_map)
    # broadcast_threshold=0 forces the join path
    b = encode_with_dicts(parsed, lt_df, v_df, broadcast_threshold=0, key_col="url")
    rows_a = {
        r["url"]: (r["logtype_id"], tuple(r["encoded_vars"]), tuple(r["dict_var_ids"]))
        for r in a.collect()
    }
    rows_b = {
        r["url"]: (r["logtype_id"], tuple(r["encoded_vars"]), tuple(r["dict_var_ids"]))
        for r in b.collect()
    }
    assert rows_a == rows_b
    parsed.unpersist()


def test_pipeline_distributed_dict_path(spark, pages_df, tmp_path):
    """compress with driver_dict_cap=0 (pure distributed path) produces
    the same sinks + metrics as the default driver path."""
    from clp_spark.config import PipelineConfig
    from clp_spark.pipeline import compress

    cfg_a = PipelineConfig(num_checkpoint_buckets=1)
    cfg_b = PipelineConfig(num_checkpoint_buckets=1, driver_dict_cap=0)
    res_a = compress(spark, pages_df, str(tmp_path / "a"), cfg_a)
    res_b = compress(spark, pages_df, str(tmp_path / "b"), cfg_b)
    ma = [tuple(r) for r in spark.read.parquet(res_a["metrics"]).orderBy("sink_id").collect()]
    mb = [tuple(r) for r in spark.read.parquet(res_b["metrics"]).orderBy("sink_id").collect()]
    assert ma == mb
