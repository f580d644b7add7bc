"""Truncating-DIV divergence audit (VERDICT r9 #3).

The divergence class: Spark ``DIV`` by zero yields NULL while DuckDB
``//`` by zero raises — so any oracle/Spark pair dividing by a
data-dependent quantity is one adversarial fixture away from a red
gate (``cohens_kappa_agreement``'s ``n*n - s`` was the canonical
example). This tool sweeps every string literal in the query modules
for ``DIV`` / ``//`` sites, classifies each divisor, and prints the
residual (not provably safe) list for manual triage.

Safe classes recognized automatically:
- numeric / constant-expression / f-string-constant literals
- divisors containing NULLIF (already guarded)
- COUNT(*) / COUNT(1) (>= 1 for any group that produced a row)
- GREATEST(..., positive-literal) floors
- products of COUNT(*)

Everything else is RESIDUAL and must be either NULLIF-guarded on BOTH
engines or proven >= 1 structurally (window/group COUNT aliases,
MAX-MIN+1 bin widths, join-predicate differences like ``b.m - a.m``
with ``a.m < b.m``). The round-10 sweep's per-site verdicts are
recorded in SCALE.md ("Truncating-DIV sweep").

Usage: python tools/div_audit.py  (run from the repo root)
"""
import ast
import glob
import re
from collections import Counter, defaultdict


def divisor_after(s: str, pos: int) -> str:
    rest = s[pos:].lstrip()
    m = re.match(r"[A-Za-z_][\w.]*\s*\(", rest)
    if m or rest.startswith("("):
        start = 0 if rest.startswith("(") else m.end() - 1
        depth, i = 0, start
        while i < len(rest):
            if rest[i] == "(":
                depth += 1
            elif rest[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        return rest[: i + 1]
    m = re.match(r"[^\s,)\n]+", rest)
    return m.group(0) if m else ""


def strip_trailing(d: str) -> str:
    while d and d[-1] in ",;":
        d = d[:-1]
    while d.endswith(")") and d.count("(") < d.count(")"):
        d = d[:-1].rstrip().rstrip(",;")
    return d.strip()


def classify(d: str):
    d = strip_trailing(d)
    u = d.upper()
    if not d:
        return "empty"
    if re.fullmatch(r"-?\d[\d_]*(\.\d+)?", d):
        return "literal"
    if re.fullmatch(r"[\d_+*()<>\s.]+", d):
        return "literal"
    if re.fullmatch(r"\{[^}]*\}[\d.]*", d):
        return "fstring"
    if "NULLIF" in u:
        return "guarded"
    if re.fullmatch(r"(COUNT\(\*\)|COUNT\(1\))", u):
        return "count_star"
    if u.startswith("GREATEST") and re.search(
        r",\s*\d*[1-9][\d_]*(\.\d+)?\s*\)$", u
    ):
        return "greatest_floor"
    if re.fullmatch(r"\(\s*COUNT\(\*\)\s*(\*\s*COUNT\(\*\)\s*)+\)", u):
        return "count_star"
    return None


def _docstrings(tree):
    out = set()
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
        ):
            if (
                node.body
                and isinstance(node.body[0], ast.Expr)
                and isinstance(node.body[0].value, ast.Constant)
                and isinstance(node.body[0].value.value, str)
            ):
                out.add(id(node.body[0].value))
    return out


def sweep(pattern="series_tiempo_ar_scraping_spark/queries*.py"):
    seen, hits = set(), []
    for f in sorted(glob.glob(pattern)):
        tree = ast.parse(open(f).read())
        docs = _docstrings(tree)
        fstr_parts = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.JoinedStr):
                for v in node.values:
                    if isinstance(v, ast.Constant) and isinstance(
                        v.value, str
                    ):
                        fstr_parts.add(id(v))
        for node in ast.walk(tree):
            vals = []
            if isinstance(node, ast.JoinedStr):
                vals = [
                    (v.value, node.lineno)
                    for v in node.values
                    if isinstance(v, ast.Constant)
                    and isinstance(v.value, str)
                ]
            elif (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and id(node) not in docs
                and id(node) not in fstr_parts
            ):
                vals = [(node.value, node.lineno)]
            for s, ln in vals:
                for m in re.finditer(r"\bDIV\b|//", s):
                    if m.group(0) == "//" and m.start() > 0 and (
                        s[m.start() - 1] in ":[(^"
                    ):
                        continue  # URL or regex, not division
                    line_start = s.rfind("\n", 0, m.start()) + 1
                    if "--" in s[line_start : m.start()]:
                        continue  # SQL comment
                    d = divisor_after(s, m.end())
                    key = (f, ln, s[:50], m.start())
                    if key in seen:
                        continue
                    seen.add(key)
                    hits.append(
                        (classify(d) or "RESIDUAL", f, ln, strip_trailing(d))
                    )
    return hits


if __name__ == "__main__":
    hits = sweep()
    print(Counter(h[0] for h in hits), "TOTAL", len(hits))
    byf = defaultdict(list)
    for cl, f, ln, d in hits:
        if cl == "RESIDUAL":
            byf[f].append((ln, d))
    for f in sorted(byf):
        print(f"== {f} ({len(byf[f])})")
        for ln, d in byf[f]:
            print(f"  {ln}: [{d[:80]}]")
