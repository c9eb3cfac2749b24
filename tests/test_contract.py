"""Driver-contract guards: queries()/oracle_sql() stay in lockstep and
entry() produces a stable non-empty result."""

import sys

sys.path.insert(0, "/root/repo")


def test_queries_oracle_key_parity(ray_session):
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(qs) == set(sqls), (
        f"missing oracles: {sorted(set(qs) - set(sqls))}; "
        f"orphan oracles: {sorted(set(sqls) - set(qs))}"
    )
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    assert n >= 0
    cols = res.schema().names if hasattr(res, "schema") else list(res.columns)
    assert len(cols) > 0
