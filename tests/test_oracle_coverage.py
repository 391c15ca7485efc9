"""Round-3 verdict #7: a registered query can never again lack oracle
coverage. Every name in ``__spark_entry__.queries()`` must carry an
``oracle_sql()`` entry (the driver's hard-signal path) — non-SQL ops
would get only the weaker rows-only check, and round 3's 5 missing
CORRECTNESS rows came exactly from that daylight. An explicit allowlist
makes any intentional future exception reviewable instead of silent.
"""
import __spark_entry__ as entry

# names intentionally exempt from the SQL oracle (must stay empty unless
# a genuinely non-SQL-expressible op lands; document why when it does)
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_registered_query_has_an_oracle():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles - ROWS_ONLY_ALLOWED
    assert not missing, (
        f"queries registered without oracle_sql coverage: {sorted(missing)}")


def test_no_orphan_oracles():
    """An oracle for an unregistered query is dead weight or a typo'd
    key — either way the driver would never run it."""
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracles with no matching query: {sorted(orphans)}"


def test_oracle_check_tool_covers_all_queries():
    """tools/oracle_check.py (the driver replica) defaults to exactly
    the queries-with-oracles set; with full oracle coverage that must be
    every registered query."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    default_names = [n for n in qs if n in oracles]
    assert sorted(default_names) == sorted(qs)
