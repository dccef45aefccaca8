#!/usr/bin/env python3
"""Adversarial-semantics differential for the oracle registry (dev
harness; driver-side python allowed for tooling — NOT the library).

Re-runs each oracle SQL with `round(x, k)` textually swapped for an
alternative implementation a different DuckDB build could plausibly
use (multiply + floor(x+0.5), i.e. half-toward-+inf on the scaled
double), and exact-compares against the stock run. A query whose
output changes is sitting on a rounding boundary for this data — it
would split under a DuckDB whose round differs from the local build,
exactly the failure mode of the round-8 driver reds.

Usage: python3 tools/adversarial.py <sfDir> <oracle_sql.json> [names...]
"""
import sys, json, os, re
import duckdb

def connect(sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # alternative round: scale, then floor(x + 0.5) — differs from
    # std::round / BigDecimal HALF_UP exactly on scaled-half
    # boundaries (and for negatives on any half: -2.5 -> -2 not -3).
    con.execute("""CREATE MACRO __radv(x, k) AS
      CASE WHEN x IS NULL THEN NULL
           ELSE floor(x * power(10, k) + 0.5) / power(10, k) END""")
    return con

ROUND_RE = re.compile(r"\bround\s*\(", re.I)

def _arity(sql, open_idx):
    """Top-level comma count inside the paren starting at open_idx.
    Returns (n_args, close_idx) or (None, None) on unbalanced text."""
    depth, brackets, commas, i, n = 0, 0, 0, open_idx, len(sql)
    in_str = False
    while i < n:
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return commas + 1, i
        elif c == "[":
            brackets += 1
        elif c == "]":
            brackets -= 1
        elif c == "," and depth == 1 and brackets == 0:
            # a comma inside a ['a','b'] list literal is NOT an
            # argument separator — track [] depth alongside parens
            commas += 1
        i += 1
    return None, None

def swap_round(sql):
    """Swap only 2-arg round(x, k) sites for __radv — 1-arg round(x)
    has no scaled-half boundary to flip and would bind-error against
    the 2-arg macro, polluting the FLIP count (ADVICE round 9)."""
    out, pos = [], 0
    for m in ROUND_RE.finditer(sql):
        open_idx = m.end() - 1
        if open_idx < pos:
            continue  # inside an already-emitted span
        nargs, _ = _arity(sql, open_idx)
        if nargs == 2:
            out.append(sql[pos:m.start()])
            out.append("__radv(")
            pos = m.end()
    out.append(sql[pos:])
    return "".join(out)

def df_equal(a, b):
    import pandas as pd, math
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False, ("shape", None, None, None)
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            eq = (x == y)
            if isinstance(x, float) and isinstance(y, float):
                eq = (x == y) or (math.isnan(x) and math.isnan(y))
            if pd.isna(x) and pd.isna(y):
                eq = True
            if not eq:
                return False, (c, i, x, y)
    return True, None

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    oracles = json.load(open(oracle_path))
    names = sys.argv[3:] or sorted(oracles)
    con = connect(sf_dir)
    n_flag = 0
    for name in names:
        sql = oracles[name]
        try:
            base = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[err ] {name}: base failed: {str(e)[:120]}")
            continue
        swapped = swap_round(sql)
        if swapped == sql:
            print(f"[none] {name}: no round() sites")
            continue
        try:
            adv = con.execute(swapped).fetchdf()
        except Exception as e:
            print(f"[err ] {name}: adv failed: {str(e)[:120]}")
            n_flag += 1
            continue
        ok, diff = df_equal(base, adv)
        if ok:
            print(f"[ok  ] {name}")
        else:
            c, i, x, y = diff
            print(f"[FLIP] {name}: col={c} row={i} stock={x!r} adv={y!r}")
            n_flag += 1
    print(f"== {n_flag} flagged / {len(names)} ==")

if __name__ == "__main__":
    main()
