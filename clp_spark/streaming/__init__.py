"""Structured Streaming ingest: incremental compress + live timeline.

The reference is batch-per-job; its incremental surface is the
log-ingestor's SQS→buffered-compression-jobs loop (micro-batching:
log-ingestor/src/compression/buffer.rs, compression_job_submitter.rs)
and the reducer's periodic timeline upsert (reducer/ServerContext.hpp:
112-156). Spark-first equivalents: `trigger(availableNow=True)`
micro-batches over a file source with exactly-once checkpointing, and a
windowed count in update mode.
"""

from clp_spark.streaming.ingest import stream_compress, stream_count_by_time

__all__ = ["stream_compress", "stream_count_by_time"]
