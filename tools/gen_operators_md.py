"""Generate OPERATORS.md — the user-facing catalog of every registered
query key — from live `load_registry()` metadata (round-15 verdict
task: 309 keys were documented only in docstrings and SURVEY §2.12
prose; this is the first-touch operability file a real user reads).

Each row is derived, never hand-written:

- **key / module:line** — registry key and the implementing function's
  source location (inspect), so the catalog can never drift from the
  code the way a hand-maintained table would.
- **check** — `hash` (driver runs the embedded DuckDB oracle SQL and
  value-hash-compares) or `rows-only` (declared non-SQL-expressible:
  the three ANN keys).
- **purpose** — the function docstring's first line.
- **scale note** — the first docstring sentence that speaks to scale
  behavior (shuffle/broadcast/bound/linearity...), pulled by marker
  regex; `—` when the docstring's first line already says it all.

Regenerated at every round close (same discipline as PLANS.md);
tests/test_contract.py keyset-diffs the committed file against the
live registry so a new or renamed key cannot ship uncataloged.

Usage: python tools/gen_operators_md.py [out.md]
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uchr_scetl_spark import load_registry  # noqa: E402

_SCALE_MARKERS = re.compile(
    r"100 TB|at scale|scales?\b|shuffle|broadcast|bucket|salt|linear|"
    r"quadratic|bounded|partial[- ]agg|exchange|O\(|driver-sized|"
    r"pushdown|pushed|codegen|partition",
    re.IGNORECASE,
)


def _sentences(text: str) -> list[str]:
    # split on sentence ends, keeping it simple: docstrings here are
    # prose paragraphs; semicolon-heavy lines still yield useful spans
    flat = " ".join(text.split())
    return [s.strip() for s in re.split(r"(?<=[.!?]) ", flat) if s.strip()]


def _row(key, spec) -> dict:
    fn = spec.fn
    doc = inspect.getdoc(fn) or ""
    sents = _sentences(doc)
    first = sents[0] if sents else ""
    if len(first) > 180:
        first = first[:177] + "..."
    mod = fn.__module__.replace("uchr_scetl_spark.", "")
    try:
        line = inspect.getsourcelines(fn)[1]
    except OSError:  # pragma: no cover
        line = 0
    scale = "—"
    for s in _sentences(doc)[1:]:
        if _SCALE_MARKERS.search(s):
            scale = s if len(s) <= 220 else s[:217] + "..."
            break
    return {
        "key": key,
        "check": "rows-only" if spec.rows_only else "hash",
        "loc": f"{mod}:{line}",
        "purpose": first.rstrip("."),
        "scale": scale,
    }


def generate() -> str:
    reg = load_registry()
    rows = [_row(k, reg[k]) for k in sorted(reg)]
    n_hash = sum(1 for r in rows if r["check"] == "hash")
    lines = [
        "# OPERATORS",
        "",
        "Auto-generated from the live registry by "
        "`tools/gen_operators_md.py` — do not edit by hand "
        "(regenerated at every round close; tests/test_contract.py "
        "keyset-diffs it against `load_registry()`).",
        "",
        f"{len(rows)} keys: {n_hash} value-hash-checked against an "
        f"embedded DuckDB oracle, {len(rows) - n_hash} declared "
        "rows-only (ANN — candidate sets are admissible-by-construction, "
        "exact agreement asserted statistically in tests). Every key is "
        "a `(spark, sf_dir) -> DataFrame` callable in "
        "`__spark_entry__.queries()`.",
        "",
        "| key | check | source | purpose | scale note |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        cells = [r["key"], r["check"], f"`{r['loc']}`", r["purpose"], r["scale"]]
        lines.append("| " + " | ".join(c.replace("|", "\\|") for c in cells) + " |")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "OPERATORS.md",
    )
    text = generate()
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out} ({text.count(chr(10))} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
