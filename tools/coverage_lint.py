"""Registry <-> COVERAGE.md <-> README rows-only-ledger drift lint.

337 hand-maintained COVERAGE lines + 280 contract queries is past the
size where silent drift stays visible (round-9 verdict ask #4), so the
three consistency contracts are now mechanical:

1. every `registry.QUERIES` name is mentioned in COVERAGE.md (a new
   operator cannot ship without its coverage row);
2. the rows-only set (queries() minus oracle_sql()) is EXACTLY the
   README "Rows-only ledger" table — a query can neither lose its
   oracle silently nor stay in the ledger after graduating;
3. every plan_inventory allowlist entry (BOUNDED_BNLJ_OK,
   EXACT_PERCENTILE_OK, HOF_WINNOW_OK, BOUNDED_WINDOW_OK) names a live
   query — a renamed/retired query cannot leave a stale exemption that
   would silently un-guard a future query taking the old name;
4. the COMMITTED PLANS.md carries zero hard flags ('!'-suffixed tokens
   in the flags column) — round 10 shipped an EXACT-PCTL! because the
   flag only gated the regen path, not the committed artifact
   (VERDICT r10 ask #1); plan_inventory.py now also exits 1 on any
   hard flag, so both the generator and the artifact are gated.
5. every `x5_*` contract query is a member of bench.HEADLINE (r12
   verdict ask #1: the 34-query TPC-H-equivalent suite — the
   shuffle-heaviest shapes in the repo — was silently unbenched, so a
   >2x regression there was invisible round-over-round); HEADLINE
   entries must also all be live registry queries.

Run standalone (exit 1 + problem list on drift):

    python tools/coverage_lint.py

or via pytest (tests/test_coverage_lint.py), which also seeds a
deliberate drift through the injectable parameters to prove the lint
fails when it should.
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _read(path: str) -> str:
    with open(path, encoding="utf-8") as fh:
        return fh.read()


def coverage_listed_names(coverage_text: str) -> str:
    """COVERAGE.md table-row cell text with every parenthesized segment
    removed. Contract 1 matches names against THIS, not the whole file:
    a query mentioned only inside another row's parenthetical prose (a
    twin / see-also / 'stream twin noted' aside) must not count as
    having its own coverage row — real entries are comma-list items in
    the query cell, outside any parens."""
    kept = []
    for line in coverage_text.splitlines():
        if not line.startswith("|"):
            continue
        # drop innermost parens repeatedly (handles nesting)
        prev = None
        while prev != line:
            prev = line
            line = re.sub(r"\([^()]*\)", " ", line)
        kept.append(line)
    return "\n".join(kept)


def ledger_names(readme_text: str) -> set[str]:
    """Query names in the README 'Rows-only ledger' table (first column,
    backticked)."""
    m = re.search(r"## Rows-only ledger(.*?)(?:\n## |\Z)", readme_text,
                  re.S)
    if not m:
        return set()
    return set(re.findall(r"^\| `([a-z0-9_]+)` \|", m.group(1), re.M))


def run_lint(
    queries: set[str] | None = None,
    oracles: set[str] | None = None,
    coverage_text: str | None = None,
    readme_text: str | None = None,
    allowlists: dict[str, set[str]] | None = None,
    plans_text: str | None = None,
    bench_headline: set[str] | None = None,
) -> list[str]:
    """Return a list of human-readable drift problems (empty == green).

    Every input is injectable so the pytest negative test can seed a
    drift without touching the real artifacts; defaults read the live
    repo state.
    """
    if queries is None or oracles is None:
        import __spark_entry__ as entry

        queries = set(entry.queries()) if queries is None else queries
        oracles = set(entry.oracle_sql()) if oracles is None else oracles
    if coverage_text is None:
        coverage_text = _read(os.path.join(_REPO, "COVERAGE.md"))
    if readme_text is None:
        readme_text = _read(os.path.join(_REPO, "README.md"))
    if allowlists is None:
        from tools import plan_inventory as pi

        allowlists = {
            "BOUNDED_BNLJ_OK": set(pi.BOUNDED_BNLJ_OK),
            "EXACT_PERCENTILE_OK": set(pi.EXACT_PERCENTILE_OK),
            "HOF_WINNOW_OK": set(pi.HOF_WINNOW_OK),
            "BOUNDED_WINDOW_OK": set(pi.BOUNDED_WINDOW_OK),
        }

    problems: list[str] = []

    # 1. every contract query is LISTED in a table row outside parens,
    # not merely mentioned in another row's parenthetical prose
    listed = coverage_listed_names(coverage_text)
    missing_cov = sorted(
        q for q in queries
        if not re.search(rf"\b{re.escape(q)}\b", listed)
    )
    for q in missing_cov:
        problems.append(
            f"COVERAGE.md: contract query `{q}` not listed in a table "
            "row (parenthetical mentions don't count)"
        )

    # 2. rows-only set == README ledger set, both directions
    rows_only = queries - oracles
    ledger = ledger_names(readme_text)
    for q in sorted(rows_only - ledger):
        problems.append(
            f"README ledger: `{q}` is rows-only (no oracle_sql entry) but "
            "missing from the Rows-only ledger table"
        )
    for q in sorted(ledger - rows_only):
        problems.append(
            f"README ledger: `{q}` is listed rows-only but "
            + ("now has an oracle (graduated — remove the ledger row)"
               if q in queries else "is not a contract query")
        )

    # 3. allowlist entries name live queries
    for listname, names in sorted(allowlists.items()):
        for q in sorted(names - queries):
            problems.append(
                f"plan_inventory.{listname}: `{q}` is not a live "
                "registry query (stale exemption)"
            )

    # 4. committed PLANS.md must carry zero hard flags. A hard flag is
    # a '!'-suffixed token in the flags column (last cell) of a table
    # row — the header legend's prose mentions of flag names don't
    # match because they aren't inside a `| ... |` row's final cell.
    if plans_text is None:
        plans_path = os.path.join(_REPO, "PLANS.md")
        plans_text = _read(plans_path) if os.path.exists(plans_path) else ""
    for line in plans_text.splitlines():
        if not line.startswith("| "):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 7:
            continue
        hard = [tok for tok in cells[-1].split() if tok.endswith("!")]
        if hard:
            problems.append(
                f"PLANS.md: `{cells[0]}` carries hard flag(s) "
                f"{' '.join(hard)} — fix the plan or allowlist with a "
                "documented scale swap, then regenerate"
            )

    # oracles must be a subset of queries (driver contract invariant)
    for q in sorted(oracles - queries):
        problems.append(
            f"oracle_sql: `{q}` has an oracle but no queries() entry"
        )

    # 5. x5 suite bench membership (r12 verdict ask #1) + no stale
    # HEADLINE entries pointing at renamed/retired queries
    if bench_headline is None:
        import bench

        bench_headline = set(bench.HEADLINE)
    for q in sorted({n for n in queries if n.startswith("x5_")}
                    - bench_headline):
        problems.append(
            f"bench.HEADLINE: x5 contract query `{q}` is not benched — "
            "the TPC-H-equivalent suite is lint-forced into HEADLINE"
        )
    for q in sorted(bench_headline - queries):
        problems.append(
            f"bench.HEADLINE: `{q}` is not a live registry query "
            "(stale bench entry)"
        )

    return problems


def main() -> int:
    problems = run_lint()
    for p in problems:
        print(p)
    print(f"{len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
