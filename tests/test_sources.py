"""Compressed log-file sources → assemble → compress end-to-end
(LibarchiveReader analog: Spark's built-in codec decode)."""

from __future__ import annotations

import gzip
import os

from clp_spark.parse.assemble import assemble_messages
from clp_spark.sources import read_text_log_files

LOG1 = (
    "2015-01-31T15:50:45.392 INFO start job 7\n"
    "2015-01-31T15:50:46.001 ERROR boom at stage 2\n"
    "    caused by: timeout after 2.5 sec\n"
    "2015-01-31T15:50:47.100 INFO done\n"
)
LOG2 = (
    "2015-02-01 08:00:00 WARN disk 93 percent\n"
    "2015-02-01 08:00:05 WARN disk 95 percent\n"
)


def test_gzip_source_lines_and_assembly(spark, tmp_path):
    d = tmp_path / "logs"
    os.makedirs(d)
    with gzip.open(d / "a.log.gz", "wt") as f:
        f.write(LOG1)
    with open(d / "b.log", "w") as f:
        f.write(LOG2)

    lines = read_text_log_files(spark, str(d) + "/*")
    by_file: dict = {}
    for r in lines.collect():
        name = os.path.basename(r["path"])
        by_file.setdefault(name, []).append((r["line_no"], r["line"]))
    assert [l for _, l in sorted(by_file["a.log.gz"])] == LOG1.rstrip("\n").split("\n")
    assert [l for _, l in sorted(by_file["b.log"])] == LOG2.rstrip("\n").split("\n")

    msgs = assemble_messages(
        lines, file_col="path", line_no_col="line_no", line_col="line"
    )
    got = {
        (os.path.basename(r["file"]), r["msg_idx"]): r["message"]
        for r in msgs.collect()
    }
    assert got[("a.log.gz", 1)] == (
        "2015-01-31T15:50:46.001 ERROR boom at stage 2\n"
        "    caused by: timeout after 2.5 sec"
    )
    assert len([k for k in got if k[0] == "a.log.gz"]) == 3
    assert len([k for k in got if k[0] == "b.log"]) == 2
