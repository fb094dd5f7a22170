"""Vacuity audit: find registry keys whose correctness green is evidence-free.

A key can hash-match the DuckDB oracle while proving nothing, two ways:

1. **Vacuous output** — the whole query returns 0 rows at the audit
   scale, so Spark and DuckDB trivially agree (the round-6 verdict
   caught ``join_theta_range`` this way: its events-side predicate
   matched zero rows at sf0.01).
2. **Vacuous branch** — the output is non-empty but some literal
   predicate arm (a WHERE conjunct, a CASE WHEN test) never fires on
   the corpus, so the code path it guards is untested even though the
   key is green.

This tool audits both, registry-wide, using only DuckDB (valid because
every audited key is hash-exact Spark==oracle; auditing the oracle IS
auditing the Spark result):

- runs every oracle at the audit scale and flags 0-row outputs;
- regex-extracts simple literal comparison atoms
  (``col op literal``, ``col BETWEEN a AND b``, ``col LIKE 'p'``,
  ``col IN (...)``) from each oracle SQL, resolves the column to base
  parquet tables by name, and counts matching rows per atom — atoms
  that match 0 rows in every candidate table are flagged.

Atoms over derived/CTE columns (no base table carries the name) are
reported as unchecked, not flagged — the audit is deliberately
conservative: every flag is a real zero-fire literal on base data.

Usage:  python tools/vacuity_audit.py [--json OUT.json] [sf_dir]
Exit status is 0 always (it is an audit, not a gate); the committed
VACUITY.json is the round artifact the judge reads.
"""

from __future__ import annotations

import json
import re
import sys

import duckdb

sys.path.insert(0, ".")

from uchr_scetl_spark import load_registry  # noqa: E402
from uchr_scetl_spark.schemas import TABLES  # noqa: E402

# literal = optional typed prefix + quoted string, or a number
_LIT = r"(?:(?:TIMESTAMP|DATE|TIME)\s*)?'(?:[^']|'')*'|-?\d+(?:\.\d+)?(?:[eE]-?\d+)?"
_COL = r"[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)?"

_ATOM_RES = [
    # col op literal
    re.compile(rf"\b({_COL})\s*(=|<>|!=|<=|>=|<|>)\s*({_LIT})", re.I),
    # col BETWEEN lit AND lit
    re.compile(rf"\b({_COL})\s+(BETWEEN)\s+({_LIT})\s+AND\s+({_LIT})", re.I),
    # col [NOT] LIKE 'pattern'
    re.compile(rf"\b({_COL})\s+(NOT\s+LIKE|LIKE)\s+({_LIT})", re.I),
    # col [NOT] IN (lit, lit, ...)
    re.compile(
        rf"\b({_COL})\s+(NOT\s+IN|IN)\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)", re.I
    ),
]

# SQL keywords / function names the column regex can false-positive on
_NOT_COLUMNS = {
    "and", "or", "not", "when", "then", "else", "end", "case", "where",
    "on", "in", "between", "like", "limit", "offset", "interval", "cast",
    "as", "is", "null", "true", "false", "by", "order", "group", "having",
    "select", "from", "join", "over", "partition", "rows", "range",
    "preceding", "following", "current", "row", "all", "distinct", "union",
    "intersect", "except", "exists", "epoch", "second", "minute", "hour",
    "day", "month", "year", "if", "abs", "length", "count", "sum", "avg",
    "min", "max", "coalesce", "nullif", "greatest", "least", "floor",
    "ceil", "round", "power", "sqrt", "ln", "log", "exp", "mod",
}


def _base_col(col: str) -> str:
    return col.split(".")[-1].lower()


def extract_atoms(sql: str) -> list[str]:
    """Return the distinct simple literal-comparison atoms in an oracle SQL."""
    atoms: list[str] = []
    seen: set[str] = set()
    for rx in _ATOM_RES:
        for m in rx.finditer(sql):
            col = m.group(1)
            if _base_col(col) in _NOT_COLUMNS:
                continue
            atom = " ".join(g.strip() for g in m.groups() if g is not None)
            # normalise the column to its base name so table lookup works
            atom = atom.replace(col, _base_col(col), 1)
            atom = re.sub(r"\s+", " ", atom)
            if atom.lower() not in seen:
                seen.add(atom.lower())
                atoms.append(atom)
    return atoms


def build_column_index(con: duckdb.DuckDBPyConnection) -> dict[str, list[str]]:
    idx: dict[str, list[str]] = {}
    for t in TABLES:
        for (name,) in con.execute(
            f"SELECT column_name FROM (DESCRIBE {t})"
        ).fetchall():
            idx.setdefault(name.lower(), []).append(t)
    return idx


def audit(sf_dir: str) -> dict:
    registry = load_registry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    col_index = build_column_index(con)

    zero_output: list[str] = []
    zero_fire: list[dict] = []
    derived_unchecked = 0
    n_atoms_checked = 0
    per_key: dict[str, dict] = {}

    for key, spec in sorted(registry.items()):
        if spec.rows_only or not spec.oracle:
            per_key[key] = {"rows": None, "note": "rows-only (no oracle SQL)"}
            continue
        try:
            n_rows = con.execute(
                f"SELECT COUNT(*) FROM ({spec.oracle})"
            ).fetchone()[0]
        except Exception as exc:  # sink keys etc. that need temp dirs
            per_key[key] = {"rows": None, "note": f"oracle not standalone: {exc}"[:120]}
            continue
        rec: dict = {"rows": int(n_rows), "atoms": []}
        per_key[key] = rec
        if n_rows == 0:
            zero_output.append(key)
        for atom in extract_atoms(spec.oracle):
            col = atom.split()[0]
            tables = col_index.get(col, [])
            if not tables:
                derived_unchecked += 1
                rec["atoms"].append({"atom": atom, "tables": [], "fires": None})
                continue
            fires = 0
            ok_tables = []
            for t in tables:
                try:
                    cnt = con.execute(
                        f"SELECT COUNT(*) FROM {t} WHERE {atom}"
                    ).fetchone()[0]
                except Exception:
                    continue  # type-incompatible homonym column
                ok_tables.append(t)
                fires += int(cnt)
            if not ok_tables:
                derived_unchecked += 1
                rec["atoms"].append({"atom": atom, "tables": [], "fires": None})
                continue
            n_atoms_checked += 1
            rec["atoms"].append({"atom": atom, "tables": ok_tables, "fires": fires})
            if fires == 0:
                zero_fire.append({"key": key, "atom": atom, "tables": ok_tables})

    con.close()
    return {
        "sf_dir": sf_dir,
        "keys_audited": sum(1 for v in per_key.values() if v.get("rows") is not None),
        "atoms_checked": n_atoms_checked,
        "atoms_unchecked_derived": derived_unchecked,
        "zero_output_keys": zero_output,
        "zero_fire_atoms": zero_fire,
        "per_key": per_key,
    }


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    rep = audit(sf_dir)
    print(
        f"audited {rep['keys_audited']} oracles at {sf_dir}: "
        f"{rep['atoms_checked']} literal atoms checked, "
        f"{rep['atoms_unchecked_derived']} derived-column atoms skipped"
    )
    print(f"zero-output keys ({len(rep['zero_output_keys'])}):")
    for k in rep["zero_output_keys"]:
        print(f"  {k}")
    print(f"zero-fire literal atoms ({len(rep['zero_fire_atoms'])}):")
    for hit in rep["zero_fire_atoms"]:
        print(f"  {hit['key']}: {hit['atom']}  (tables {hit['tables']})")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(rep, fh, indent=2, sort_keys=True)
            fh.write("\n")
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
