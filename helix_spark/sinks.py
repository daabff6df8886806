"""Report export sinks — the reference's user-facing artifact.

The reference ships its verification report as an SQL-queryable SQLite file
or CSV (/root/reference/README.md:36-38 "Support SQLite and CSV outputs";
ReportWriterBlock.cs:111-128 SqLiteDbContext over VerificationResult rows,
unique index on VerifiedUrl — VerificationResult.cs:6-27). This module gives
the Spark report the same exits:

- fmt="csv":     ONE portable csv file at ``path`` (what the reference
                 emits). Rows are STREAMED via toLocalIterator — driver
                 memory stays bounded by one partition, not the table.
- fmt="csv-dir": distributed ``df.write.csv`` directory of part files — the
                 100 TB path (no driver involvement at all).
- fmt="sqlite":  stdlib sqlite3 file with the reference's table/column
                 names (VerificationResults, VerifiedUrl unique), streamed
                 in batches. SQLite is a single-writer file by nature, so a
                 driver stream is the honest implementation at any scale —
                 users wanting a queryable BIG report query the warehouse
                 table itself.
"""

from __future__ import annotations

import csv
import os
import sqlite3

from pyspark.sql import DataFrame

# our report column → reference VerificationResult property
_REPORT_COLS = {
    "verified_url": "VerifiedUrl",
    "parent_url": "ParentUrl",
    "is_internal": "IsInternalResource",
    "resource_type": "ResourceType",
    "status_code": "StatusCode",
}


def export_report(report: DataFrame, path: str, fmt: str = "csv") -> int:
    """Export a report DataFrame (one row per verified_url). Returns the
    number of rows exported (csv/sqlite) or -1 for the distributed csv-dir
    write (counting would add a full extra pass)."""
    cols = [c for c in _REPORT_COLS if c in report.columns]
    df = report.select(*cols)

    if fmt == "csv-dir":
        df.toDF(*[_REPORT_COLS[c] for c in cols]).write.mode("overwrite").option(
            "header", True
        ).csv(path)
        return -1

    if fmt == "csv":
        n = 0
        tmp = path + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([_REPORT_COLS[c] for c in cols])
            for row in df.toLocalIterator():
                w.writerow([row[c] for c in cols])
                n += 1
        os.replace(tmp, path)
        return n

    if fmt == "sqlite":
        if os.path.exists(path):
            os.remove(path)
        con = sqlite3.connect(path)
        try:
            col_defs = ", ".join(f"{_REPORT_COLS[c]} " + (
                "INTEGER" if c in ("is_internal", "status_code") else "TEXT"
            ) for c in cols)
            con.execute(
                "CREATE TABLE VerificationResults ("
                "Id INTEGER PRIMARY KEY AUTOINCREMENT, "
                f"{col_defs})"
            )
            con.execute(
                "CREATE UNIQUE INDEX IX_VerificationResults_VerifiedUrl "
                "ON VerificationResults (VerifiedUrl)"
            )
            placeholders = ", ".join("?" for _ in cols)
            names = ", ".join(_REPORT_COLS[c] for c in cols)
            n, batch = 0, []
            for row in df.toLocalIterator():
                batch.append(tuple(
                    int(row[c]) if c == "is_internal" and row[c] is not None else row[c]
                    for c in cols
                ))
                if len(batch) >= 10_000:
                    con.executemany(
                        f"INSERT INTO VerificationResults ({names}) VALUES ({placeholders})",
                        batch,
                    )
                    n += len(batch)
                    batch = []
            if batch:
                con.executemany(
                    f"INSERT INTO VerificationResults ({names}) VALUES ({placeholders})",
                    batch,
                )
                n += len(batch)
            con.commit()
        finally:
            con.close()
        return n

    raise ValueError(f"unknown report format: {fmt}")
