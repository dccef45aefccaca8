#!/usr/bin/env python3
"""Output-type envelope audit (dev harness, driver-side python).

The round-8 driver-red cohort was exactly the queries whose result
schemas carried DECIMAL or HUGEINT columns; the 260 greens carried
(almost) none. This enforces the envelope on BOTH sides:

  - oracle side: DESCRIBE each oracle SQL -> no DECIMAL, no HUGEINT
  - spark side: DESCRIBE each <outDir>/<name>/*.parquet -> same
  - both present: flag column-type family mismatches (int vs double
    vs string vs bool vs date/ts)

Usage: python3 tools/type_envelope.py <sfDir> <outDir>
  (outDir from a prior `graft.Verify <sfDir> <outDir>` run;
   oracle_sql.json must be present)
"""
import sys, json, os, glob
import duckdb

BANNED = ("DECIMAL", "HUGEINT", "UHUGEINT")

def family(t):
    t = t.upper()
    if t.startswith(("TINYINT","SMALLINT","INTEGER","BIGINT","UINTEGER","UBIGINT","USMALLINT","UTINYINT")):
        return "int"
    if t.startswith(("DOUBLE","FLOAT","REAL")): return "float"
    if t.startswith("DECIMAL"): return "decimal"
    if t.startswith(("HUGEINT","UHUGEINT")): return "hugeint"
    if t.startswith("BOOLEAN"): return "bool"
    if t.startswith(("VARCHAR","TEXT","STRING")): return "str"
    if t.startswith(("DATE",)): return "date"
    if t.startswith("TIMESTAMP"): return "ts"
    return t

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracles):
        issues = []
        try:
            otypes = {c[0]: c[1] for c in
                      con.execute(f"DESCRIBE ({oracles[name]})").fetchall()}
        except Exception as e:
            issues.append(f"oracle DESCRIBE failed: {str(e)[:80]}")
            otypes = {}
        for c, t in otypes.items():
            if t.upper().startswith(BANNED):
                issues.append(f"oracle col {c}: {t}")
        sp = f"{out_dir}/{name}/*.parquet"
        stypes = {}
        if glob.glob(sp):
            stypes = {c[0]: c[1] for c in
                      con.execute(f"DESCRIBE (SELECT * FROM '{sp}')").fetchall()}
            for c, t in stypes.items():
                if t.upper().startswith(BANNED):
                    issues.append(f"spark col {c}: {t}")
        if otypes and stypes:
            for c in otypes:
                if c in stypes and family(otypes[c]) != family(stypes[c]):
                    issues.append(
                        f"family mismatch {c}: oracle {otypes[c]} vs spark {stypes[c]}")
        if issues:
            n_bad += 1
            print(f"[BAD] {name}:")
            for i in issues:
                print(f"      {i}")
    print(f"== {n_bad} queries outside the type envelope ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
