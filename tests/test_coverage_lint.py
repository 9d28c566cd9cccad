"""Registry <-> COVERAGE.md <-> README-ledger drift lint (r8 verdict ask
#4): the live repo state must lint clean, and seeded drifts must fail —
proving the lint actually detects each class it claims to."""

from tools.coverage_lint import ledger_names, run_lint


def test_live_repo_lints_clean():
    assert run_lint() == []


def _base_inputs():
    """A tiny self-consistent fixture world."""
    queries = {"q1_scan", "x1_dedup", "x1_minhash_neardup"}
    oracles = {"q1_scan", "x1_dedup"}
    coverage = (
        "| Family | Query | Check |\n|---|---|---|\n"
        "| scans | q1_scan | oracle |\n"
        "| dedup | x1_dedup, x1_minhash_neardup (seeded) | oracle/rows |\n"
    )
    readme = (
        "## Rows-only ledger\n\n"
        "| query | why | twin |\n|---|---|---|\n"
        "| `x1_minhash_neardup` | seeded | `x1_dedup` |\n"
        "\n## Status\n"
    )
    allow = {"BOUNDED_BNLJ_OK": {"x1_dedup"}}
    headline = {"q1_scan", "x1_dedup"}
    return queries, oracles, coverage, readme, allow, headline


def test_consistent_fixture_passes():
    q, o, cov, readme, allow, head = _base_inputs()
    assert run_lint(q, o, cov, readme, allow, bench_headline=head) == []


def test_seeded_drifts_each_fail():
    q, o, cov, readme, allow, head = _base_inputs()

    # a new query with no COVERAGE mention
    probs = run_lint(q | {"x9_new_op"}, o | {"x9_new_op"}, cov, readme,
                     allow, bench_headline=head)
    assert any("x9_new_op" in p and "COVERAGE" in p for p in probs)

    # a query mentioned ONLY in another row's parenthetical prose must
    # still fail (the r9 ADVICE false-pass class)
    cov_paren = cov + "| other | x1_dedup (twin: x9_ghost_twin) | oracle |\n"
    probs = run_lint(q | {"x9_ghost_twin"}, o | {"x9_ghost_twin"},
                     cov_paren, readme, allow, bench_headline=head)
    assert any("x9_ghost_twin" in p and "COVERAGE" in p for p in probs)

    # ...and a non-table prose mention outside any row must also fail
    cov_prose = cov + "\nsee also x9_prose_only for details\n"
    probs = run_lint(q | {"x9_prose_only"}, o | {"x9_prose_only"},
                     cov_prose, readme, allow, bench_headline=head)
    assert any("x9_prose_only" in p and "COVERAGE" in p for p in probs)

    # a query silently losing its oracle (rows-only but not in ledger)
    probs = run_lint(q, o - {"x1_dedup"}, cov, readme, allow,
                     bench_headline=head)
    assert any("x1_dedup" in p and "ledger" in p for p in probs)

    # a graduated query still squatting in the ledger
    probs = run_lint(q, o | {"x1_minhash_neardup"}, cov, readme,
                     allow, bench_headline=head)
    assert any("graduated" in p for p in probs)

    # a stale allowlist exemption
    probs = run_lint(q, o, cov, readme,
                     {"BOUNDED_WINDOW_OK": {"x7_retired_query"}},
                     bench_headline=head)
    assert any("x7_retired_query" in p and "stale" in p for p in probs)

    # an oracle with no queries() entry
    probs = run_lint(q, o | {"ghost_oracle"}, cov, readme, allow,
                     bench_headline=head)
    assert any("ghost_oracle" in p for p in probs)

    # an x5 contract query missing from bench.HEADLINE (r12 verdict #1)
    cov_x5 = cov + "| star | x5_new_join | oracle |\n"
    probs = run_lint(q | {"x5_new_join"}, o | {"x5_new_join"}, cov_x5,
                     readme, allow, bench_headline=head)
    assert any("x5_new_join" in p and "HEADLINE" in p for p in probs)

    # a stale HEADLINE entry naming a retired query
    probs = run_lint(q, o, cov, readme, allow,
                     bench_headline=head | {"x5_retired"})
    assert any("x5_retired" in p and "stale bench" in p for p in probs)


def test_plans_hard_flag_fails_soft_flag_passes():
    """Contract 4 (r10 verdict ask #1): a committed PLANS.md carrying a
    '!'-suffixed flags-column token must fail; allowlisted soft tokens
    and header-legend prose mentioning flag names must not."""
    q, o, cov, readme, allow, head = _base_inputs()
    header = (
        "# PLANS\n\nprose legend mentioning EXACT-PCTL! and BNLJ! "
        "must not match\n\n"
        "| query | exchanges | joins | pushed filters | codegen "
        "| exec/skip | flags |\n|---|---|---|---|---|---|---|\n"
    )
    bad = header + "| x1_dedup | 4 | BroadcastHash | yes | - | - | EXACT-PCTL! |\n"
    probs = run_lint(q, o, cov, readme, allow, plans_text=bad,
                     bench_headline=head)
    assert any("x1_dedup" in p and "EXACT-PCTL!" in p for p in probs)

    ok = header + "| x1_dedup | 4 | BroadcastHash | yes | - | - | pctl-exact-ok |\n"
    assert run_lint(q, o, cov, readme, allow, plans_text=ok,
                    bench_headline=head) == []


def test_ledger_parser_extracts_names():
    _, _, _, readme, _, _ = _base_inputs()
    assert ledger_names(readme) == {"x1_minhash_neardup"}
    assert ledger_names("no ledger section here") == set()
