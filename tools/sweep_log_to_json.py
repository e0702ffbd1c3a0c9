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
    r"(PASS|FAIL|ROWS-ONLY) ([a-z0-9_]+): ((?:\d+ rows)?[^\n]*)"
)


def main() -> None:
    log_path, out_path = sys.argv[1], sys.argv[2]
    records: dict[str, dict] = {}
    text = open(log_path, errors="replace").read()
    for status, name, tail in PAT.findall(text):
        m = re.match(r"(\d+) rows", tail)
        n = int(m.group(1)) if m else None
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
        elif "SPARK ERROR" in tail:
            # environment/harness failure, NOT a correctness red —
            # mirror the live checker's None-field shape (check_oracles
            # records rows_match=False but schema/hash None; we keep the
            # error text so the artifact explains itself)
            records[name] = dict(
                rows_match=False, schema_match=None, hash_match=None,
                spark_rows=None, oracle_rows=None,
                err="spark: " + tail.split("SPARK ERROR", 1)[1].strip()[:120],
            )
        elif "ORACLE ERROR" in tail:
            records[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=None, oracle_rows=None,
                err="oracle: " + tail.split("ORACLE ERROR", 1)[1].strip()[:120],
            )
        else:
            records[name] = dict(
                rows_match=False, schema_match=None, hash_match=False,
                spark_rows=n, oracle_rows=None,
                err=tail.strip()[:160] or "see sweep log",
            )
    # provenance marker: a log-reconstructed artifact is lossier than a
    # direct check_oracles run (PASS hashes inferred, not recomputed) —
    # downstream consumers must be able to tell the two apart
    out = {"recovered_from_log": True, "source_log": log_path, **records}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {out_path} ({len(records)} records, recovered_from_log=true)")


if __name__ == "__main__":
    main()
