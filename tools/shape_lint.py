#!/usr/bin/env python3
"""Static shape-lint of the oracle SQL registry (dev harness, driver-side
python allowed for tooling — NOT part of the library).

Finds cross-engine version-sensitive constructs in oracle_sql.json:
  R: round(E, k) with k >= 1 where E's subtree contains a DOUBLE cast,
     a libm function, or a `/` division  -> unsafe unless E is exact
     decimal arithmetic (the multiply-based vs BigDecimal round trap)
  D: integer division `//` whose left subtree can plausibly go negative
     (contains a `-` or a signed aggregate)                (trunc-vs-floor)
  H: CAST(... AS HUGEINT)
  X: hex-string '0x'||... -> BIGINT cast outside the h60 whitelist form

Usage: python3 tools/shape_lint.py /tmp/r9dump/oracle_sql.json [query ...]
"""
import sys, json, re
import duckdb

# Queries allowed to carry flagged shapes, with the PROOF why each is
# safe despite the pattern match. Empty today (round-11 burn-down
# converted all 284) — add entries only with a written exactness
# argument, never to silence a new query.
ALLOWLIST = {
    # "query_name": "why this flagged shape is provably version-invariant",
}

LIBM = {"ln", "log", "log10", "log2", "exp", "pow", "power", "sqrt",
        "sin", "cos", "tan", "atan", "atan2", "asin", "acos", "exp2"}

def walk(node, fn):
    if isinstance(node, dict):
        fn(node)
        for v in node.values():
            walk(v, fn)
    elif isinstance(node, list):
        for v in node:
            walk(v, fn)

def subtree_flags(node):
    """Return set of risk markers in an expression subtree."""
    flags = set()
    def visit(n):
        cls, typ = n.get("class"), n.get("type")
        if cls == "CAST":
            tid = str(n.get("cast_type", {}).get("id", ""))
            if tid in ("DOUBLE", "FLOAT"):
                flags.add("double_cast")
            if tid == "HUGEINT":
                flags.add("hugeint")
        if cls == "FUNCTION":
            fname = n.get("function_name", "").lower()
            if fname in LIBM:
                flags.add("libm")
            if fname == "/":
                flags.add("div")
            if fname == "//":
                flags.add("intdiv")
    walk(node, visit)
    return flags

def _strip(n):
    """Canonical form of an expression node for structural equality:
    drop location/alias noise, keep shape + names + values."""
    if isinstance(n, dict):
        return {k: _strip(v) for k, v in sorted(n.items())
                if k not in ("query_location", "alias")}
    if isinstance(n, list):
        return [_strip(v) for v in n]
    return n

def _is_zero_const(n):
    return (n.get("class") == "CONSTANT"
            and n.get("value", {}).get("value") == 0)

def _unary_neg(n):
    ch = n.get("children", [])
    if (n.get("class") == "FUNCTION" and n.get("function_name") == "-"
            and len(ch) == 1):
        return ch[0]
    return None

def tdiv_safe_intdivs(node):
    """Collect id()s of `//` nodes inside the sign-pinned tdiv macro
    CASE WHEN (a)<0 THEN -((-(a))//(b)) ELSE (a)//(b) END — both its
    numerators are provably non-negative under the branch guards, so
    trunc-vs-floor `//` semantics cannot differ there."""
    safe = set()
    def visit(n):
        if n.get("class") != "CASE":
            return
        checks = n.get("case_checks", [])
        if len(checks) != 1:
            return
        w, t = checks[0].get("when_expr", {}), checks[0].get("then_expr", {})
        e = n.get("else_expr", {})
        if (w.get("type") != "COMPARE_LESSTHAN"
                or not _is_zero_const(w.get("right", {}))):
            return
        a = w.get("left", {})
        inner = _unary_neg(t)
        if inner is None or inner.get("function_name") != "//":
            return
        neg_num = _unary_neg(inner.get("children", [{}])[0] or {})
        if neg_num is None:
            return
        if (e.get("class") != "FUNCTION"
                or e.get("function_name") != "//"):
            return
        ech = e.get("children", [{}, {}])
        sa, sneg, sea = _strip(a), _strip(neg_num), _strip(ech[0])
        if sa == sneg == sea and _strip(inner["children"][1]) == _strip(ech[1]):
            safe.add(id(inner))
            safe.add(id(e))
    walk(node, visit)
    return safe

def literal_int(n):
    if n.get("class") == "CONSTANT":
        v = n.get("value", {})
        if str(v.get("type", {}).get("id", "")) in ("INTEGER","BIGINT","TINYINT","SMALLINT","UBIGINT"):
            return v.get("value")
    return None

def scan(sql):
    out = []
    try:
        ast = json.loads(duckdb.sql(
            "select json_serialize_sql(?::varchar)", params=[sql]).fetchone()[0])
    except Exception as e:
        return [("PARSE", str(e)[:80])]
    if ast.get("error"):
        return [("PARSE", str(ast.get("error_message"))[:80])]
    safe_divs = tdiv_safe_intdivs(ast)
    def visit(n):
        if n.get("class") == "FUNCTION":
            fname = n.get("function_name", "").lower()
            ch = n.get("children", [])
            if fname == "round" and len(ch) == 2:
                k = literal_int(ch[1])
                if k is not None and int(k) >= 1:
                    fl = subtree_flags(ch[0])
                    if fl & {"double_cast", "libm", "div"}:
                        out.append(("R", f"round(...,{k}) over {sorted(fl)}"))
            if fname == "//" and id(n) not in safe_divs:
                fl = subtree_flags(ch[0]) if ch else set()
                # textual heuristic for sign: '-' in the left subtree
                txt = json.dumps(ch[0]) if ch else ""
                neg = '"function_name": "-"' in txt or '"-"' in txt
                if neg:
                    out.append(("D", "// with subtraction in numerator"))
        if n.get("class") == "CAST":
            if str(n.get("cast_type", {}).get("id", "")) == "HUGEINT":
                out.append(("H", "CAST AS HUGEINT"))
    walk(ast, visit)
    return out

def main():
    oracles = json.load(open(sys.argv[1]))
    names = sys.argv[2:] or sorted(oracles)
    n_flag = 0
    n_hard = 0
    for name in names:
        hits = scan(oracles[name])
        if hits:
            n_flag += 1
            allowed = name in ALLOWLIST
            if not allowed:
                n_hard += 1
            sfx = f"  (allowlisted: {ALLOWLIST[name]})" if allowed else ""
            print(f"{name}:{sfx}")
            for tag, msg in hits:
                print(f"  [{tag}] {msg}")
    print(f"== {n_flag}/{len(names)} queries flagged ==")
    # gate: non-zero exit on any flagged query OUTSIDE the allowlist,
    # so ContractSpec (and CI) fail on a new version-fragile shape
    sys.exit(1 if n_hard else 0)

if __name__ == "__main__":
    main()
