#!/usr/bin/env python3
"""Property test for the wdiv oracle macro (exact wide trunc-division
without HUGEINT / `//` / unsafe round) — dev harness, driver-side
python allowed for tooling, NOT part of the library.

Mirrors SparkEntry.wdivStages: a CTE-staged floor division of a
non-negative DECIMAL(38,0) numerator by a positive divisor, seeded by
one IEEE double division and repaired by exact DECIMAL corrections,
with a belt stage that yields NULL if the final residual is out of
[0, den).  Trunc semantics come from a sign wrapper.  Any drift
between this twin and the Scala emitter is caught end-to-end by
tools/compare.py (the macro's output feeds real oracle queries).

Usage: python3 tools/wdiv_check.py [n_random]
"""
import sys, random, duckdb

def wdiv_stages(prefix, frm, num, den, out, pq, pd):
    """Return the CTE chain text (without WITH) computing `out` =
    trunc(num/den) from relation `frm`; NULL when den <= 0 or the
    belt trips.  pq/pd = DECIMAL precisions for the quotient cast and
    the divisor downcast (pq + pd <= 38 keeps every product binder-
    safe on engines that reject decimal multiplies wider than 38
    instead of clamping).  pd is floored at 19: DuckDB runs a decimal
    multiply in int128 only when an operand's declared width exceeds
    18 — two narrower operands yield a DECIMAL(18,0) result that
    overflows loudly above 1e18 (measured on 1.0.0)."""
    p = prefix
    return f"""{p}_w0 AS (SELECT *,
    (CASE WHEN ({num}) < 0 THEN -({num}) ELSE ({num}) END) AS {p}_a,
    (CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END) AS {p}_s,
    CAST((CASE WHEN ({den}) > 0 THEN ({den}) END) AS DECIMAL({max(pd, 19)},0)) AS {p}_d
  FROM {frm}),
{p}_w1 AS (SELECT *, CAST(floor(CAST({p}_a AS DOUBLE)
    / CAST({p}_d AS DOUBLE)) AS BIGINT) AS {p}_q0 FROM {p}_w0),
{p}_w2 AS (SELECT *, {p}_q0 + CAST(floor(CAST({p}_a
      - CAST({p}_q0 AS DECIMAL({pq},0)) * {p}_d AS DOUBLE)
    / CAST({p}_d AS DOUBLE)) AS BIGINT) AS {p}_q1 FROM {p}_w1),
{p}_w3 AS (SELECT *, {p}_a
    - CAST({p}_q1 AS DECIMAL({pq},0)) * {p}_d AS {p}_r1 FROM {p}_w2),
{p}_w4 AS (SELECT *, {p}_q1 + (CASE
      WHEN {p}_r1 < -({p}_d) THEN -2 WHEN {p}_r1 < 0 THEN -1
      WHEN {p}_r1 >= {p}_d + {p}_d THEN 2
      WHEN {p}_r1 >= {p}_d THEN 1 ELSE 0 END) AS {p}_qf FROM {p}_w3),
{p}_w5 AS (SELECT *, {p}_a
    - CAST({p}_qf AS DECIMAL({pq},0)) * {p}_d AS {p}_r2 FROM {p}_w4),
{p} AS (SELECT *, (CASE WHEN {p}_r2 >= 0 AND {p}_r2 < {p}_d
    THEN {p}_s * {p}_qf END) AS {out} FROM {p}_w5)"""

def main():
    n_rand = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rng = random.Random(20260815)
    cases = []
    dens = [1, 2, 3, 7, 10, 999, 10**6, 10**12 + 7, 10**12,
            10**18 + 9, 10**25 + 3, 3 * 10**24]
    quots = [0, 1, 2, 3, 5, 10**6, 10**9, 10**12, 10**13 - 1,
             2**40, 2**40 + 1, 2**40 - 1]
    for d in dens:
        for q in quots:
            for r in {0, 1, d - 1, d // 2}:
                for sgn in (1, -1):
                    n = sgn * (q * d + r)
                    if abs(n) < 10**37:
                        cases.append((n, d))
    for _ in range(n_rand):
        d = rng.randint(1, 10**25)
        q = rng.randint(0, 10**13 - 1)
        r = rng.randint(0, d - 1)
        n = (q * d + r) * rng.choice((1, -1))
        if abs(n) < 10**37:
            cases.append((n, d))
    # pq sized like the call sites: quotient fits well under 10^14
    pq = 14
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, n DECIMAL(38,0), d DECIMAL(38,0))")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, str(n), str(d)) for i, (n, d) in enumerate(cases)])
    sql = ("WITH " + wdiv_stages("wd", "t", "n", "d", "q_out", pq, 26) +
           " SELECT i, q_out FROM wd ORDER BY i")
    got = dict(con.sql(sql).fetchall())
    bad = 0
    for i, (n, d) in enumerate(cases):
        want = abs(n) // d * (1 if n >= 0 else -1)  # trunc toward zero
        g = got[i]
        if g is None or int(g) != want:
            bad += 1
            if bad < 10:
                print(f"MISMATCH i={i} n={n} d={d} want={want} got={g}")
    # den <= 0 -> NULL
    con.execute("CREATE TABLE z(i INT, n DECIMAL(38,0), d DECIMAL(38,0))")
    con.executemany("INSERT INTO z VALUES (?, ?, ?)",
                    [(0, "5", "0"), (1, "5", "-3"), (2, None, "7")])
    sqlz = ("WITH " + wdiv_stages("wd", "z", "n", "d", "q_out", pq, 26) +
            " SELECT i, q_out FROM wd ORDER BY i")
    for i, q in con.sql(sqlz).fetchall():
        if q is not None:
            bad += 1
            print(f"NULL-case MISMATCH i={i} got={q}")
    # narrow-declared-pd pass: products near/above 1e18 must still be
    # exact (the DECIMAL(18,0) narrow-multiply trap)
    con.execute("CREATE TABLE t2(i INT, n DECIMAL(38,0), d DECIMAL(38,0))")
    nar = [(q * (10**12 + 7) + r) for q, r in
           [(4474354, 5), (10**13 - 1, 10**11), (2**40, 0), (999, 1)]]
    con.executemany("INSERT INTO t2 VALUES (?, ?, ?)",
                    [(i, str(n), str(10**12 + 7)) for i, n in enumerate(nar)])
    sql2 = ("WITH " + wdiv_stages("wd", "t2", "n", "d", "q_out", 14, 13) +
            " SELECT i, q_out FROM wd ORDER BY i")
    for i, q in con.sql(sql2).fetchall():
        want = nar[i] // (10**12 + 7)
        if q is None or int(q) != want:
            bad += 1
            print(f"NARROW-PD MISMATCH i={i} want={want} got={q}")
    print(f"== {len(cases)+3+len(nar)} cases, {bad} mismatches ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
