#!/usr/bin/env python
"""Dump .explain("formatted") for the bench's headline + extended
queries into plans/<tag>/<query>_<suffix>.txt (round-17 optimization
evidence: the judge checks plan claims against these files).

Usage: python tools/explain_dump.py <tag> <suffix> [query ...]
  tag     plans/ subdir, e.g. r17
  suffix  'before' or 'after'
  query   optional subset; default = HEADLINE + HEADLINE_EXTENDED
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEADLINE_EXTENDED
from steaminganalysis_spark.registry import collect_queries
from steaminganalysis_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or (HEADLINE + HEADLINE_EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="sa-spark-explain")
    queries, _ = collect_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
