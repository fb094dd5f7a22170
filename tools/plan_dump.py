"""Dump ``explain("formatted")`` for named registry keys to files.

Round-15 optimization evidence: ``python tools/plan_dump.py OUTDIR
SUFFIX [sf_dir] key...`` writes ``OUTDIR/<key>_<SUFFIX>.txt`` per key —
the before/after plan artifacts the optimization rounds commit under
``plans/r15/`` so plan-shape claims are checkable without running
Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uchr_scetl_spark import get_session, load_registry  # noqa: E402


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(outdir, exist_ok=True)
    registry = load_registry()
    spark = get_session("uchr-plan-dump")
    for key in rest:
        df = registry[key].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
