"""Merge sharded check_oracle JSON records into one CORRECTNESS artifact.

Sharded gate runs (4-6 check_oracle processes, each with a query-name
list and CHECK_ORACLE_JSON) each write a partial record; this stitches
the per-shard ``queries`` dicts back into one driver-style file and
recomputes the counters. Later shards win on a duplicate query name
(the rerun convention: a failed query's retry record supersedes).

Usage: python tools/merge_correctness.py OUT.json NOTE shard1.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out, note, *shards = sys.argv[1:]
    sf_dir = None
    queries: dict[str, dict] = {}
    for path in shards:
        with open(path) as f:
            rec = json.load(f)
        sf_dir = rec.get("sf_dir", sf_dir)
        queries.update(rec.get("queries", {}))
    n_pass = sum(
        1
        for q in queries.values()
        if q.get("hash_match") is True and not q.get("err")
    )
    n_weak = sum(1 for q in queries.values() if q.get("err") == "no_oracle")
    n_fail = len(queries) - n_pass - n_weak
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "n_pass": n_pass,
                "n_fail": n_fail,
                "n_weak": n_weak,
                "queries": queries,
                "note": note,
            },
            f,
            indent=1,
        )
    print(f"{out}: {n_pass} pass, {n_fail} fail, {n_weak} weak ({len(queries)} queries)")


if __name__ == "__main__":
    main()
