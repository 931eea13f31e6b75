"""The external driver gate verifies only the first 50 entries of
queries().  Pin the emission order so every query that has never had a
driver-gate row (rounds 2-3 registrations 51-86 plus round-4
additions) sits inside the gated window, and the two mappings agree.
"""

from proj_4_spark import queries as Q


def test_priority_queries_inside_gate_window():
    order = list(Q.queries())
    first50 = set(order[:50])
    present_priority = [n for n in Q._GATE_PRIORITY if n in Q.QUERIES]
    missing = [n for n in present_priority[:50] if n not in first50]
    assert not missing, f"priority queries outside gate window: {missing}"


def test_queries_and_oracles_agree():
    qs = Q.queries()
    os_ = Q.oracle_sql()
    assert set(os_) <= set(qs)
    # shared keys must be emitted in the same relative order
    qorder = [k for k in qs if k in os_]
    assert qorder == list(os_)


def test_no_stale_priority_names():
    # every pre-round-4 priority name must exist in the registry
    pre_round4 = Q._GATE_PRIORITY[:36]
    stale = [n for n in pre_round4 if n not in Q.QUERIES]
    assert not stale, f"stale names in _GATE_PRIORITY: {stale}"
