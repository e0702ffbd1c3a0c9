#!/usr/bin/env python
"""Reconstruct a check_oracles-style JSON artifact from a sweep log.

check_oracles.py historically wrote its JSON only on completion, so a
sweep killed mid-run (round timeout, box reboot) lost every finished
query.  The checker now checkpoints, but for runs started under the old
code this tool recovers the records from the PASS/FAIL/ROWS-ONLY lines,
which carry the same row counts the JSON would have recorded.  Spark's
carriage-return progress bars can prefix the markers, so matching is
not anchored to line starts.

Usage: python tools/sweep_log_to_json.py SWEEP.log OUT.json
"""
from __future__ import annotations

import json
import re
import sys

PAT = re.compile(
    r"(PASS|FAIL|ROWS-ONLY) ([a-z0-9_]+): (?:(\d+) rows)?"
)


def main() -> None:
    log_path, out_path = sys.argv[1], sys.argv[2]
    records: dict[str, dict] = {}
    text = open(log_path, errors="replace").read()
    for status, name, rows in PAT.findall(text):
        n = int(rows) if rows else None
        if status == "PASS":
            records[name] = dict(
                rows_match=True, schema_match=True, hash_match=True,
                spark_rows=n, oracle_rows=n, err=None,
            )
        elif status == "ROWS-ONLY":
            records[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=n, oracle_rows=None, err="no_oracle",
            )
        else:
            records[name] = dict(
                rows_match=False, schema_match=None, hash_match=False,
                spark_rows=n, oracle_rows=None, err="see sweep log",
            )
    with open(out_path, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {out_path} ({len(records)} records)")


if __name__ == "__main__":
    main()
