"""Streaming line → message assembly: a custom stateful operator.

The batch path (parse/assemble.py) assembles multi-line messages with a
per-file window + groupBy — fine when the whole file is present. A live
tail can't do that: the line that COMPLETES a message (the next
timestamped line) may arrive in a later micro-batch. This is the
textbook applyInPandasWithState shape (SURVEY §2.9): state is keyed by
file and holds the in-progress message (next msg index + buffered
lines); each micro-batch appends its lines in order, emits every
message completed by a later timestamped line, and leaves the trailing
partial message in state. An idle timeout flushes a file whose tail
never gets a successor line (the reference's tailer flushes on EOF the
same way: MessageParser.cpp:48-95 buffering semantics).

Ordering contract: within one file, lines must arrive in line_no order
across batches (true for file tailing — the source appends). Files are
independent state groups, so the operator scales horizontally by file
exactly like the batch window partitions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clp_spark.functions.timestamps import match_leading_timestamp

OUT_SCHEMA = "file string, msg_idx long, message string, n_lines int"
STATE_SCHEMA = "next_idx long, pending array<string>"


def stream_assemble_messages(
    lines: DataFrame,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming (file, line_no, line) → assembled (file, msg_idx,
    message, n_lines), append mode. A message is emitted when the next
    timestamped line arrives (possibly batches later) or when the
    file's state idles past `idle_timeout_ms` (None = flush only on
    completion)."""
    use_timeout = idle_timeout_ms is not None

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        file = key[0]
        if use_timeout and state.hasTimedOut:
            next_idx, pending = state.get
            state.remove()
            if pending:
                yield pd.DataFrame(
                    {
                        "file": [file],
                        "msg_idx": [next_idx],
                        "message": ["\n".join(pending)],
                        "n_lines": [len(pending)],
                    }
                )
            return

        chunks = [pdf for pdf in pdfs]
        batch = (
            pd.concat(chunks).sort_values("line_no")
            if chunks
            else pd.DataFrame(columns=["line_no", "line"])
        )
        if state.exists:
            next_idx, pending = state.get
            pending = list(pending)
        else:
            next_idx, pending = 0, []

        out_file: list = []
        out_idx: list = []
        out_msg: list = []
        out_n: list = []
        for line in batch["line"]:
            line = line if line is not None else ""
            if match_leading_timestamp(line)[0] is not None and pending:
                out_file.append(file)
                out_idx.append(next_idx)
                out_msg.append("\n".join(pending))
                out_n.append(len(pending))
                next_idx += 1
                pending = [line]
            else:
                pending.append(line)

        state.update((next_idx, pending))
        if use_timeout:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_file:
            yield pd.DataFrame(
                {
                    "file": out_file,
                    "msg_idx": out_idx,
                    "message": out_msg,
                    "n_lines": out_n,
                }
            )

    return lines.groupBy("file").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
