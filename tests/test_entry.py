"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import importlib.util
import os

import pytest

_ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY_PATH)
spark_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(spark_entry)


def test_entry_returns_rows(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "n_name" in df.columns and "revenue" in df.columns


def test_queries_and_oracles_align(spark):
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must correspond to a registered query
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", ["pricing_summary", "topk_parts_per_brand", "purchase_asof_signup"])
def test_representative_queries_run(spark, sf_dir, name):
    df = spark_entry.queries()[name](spark, sf_dir)
    assert df.count() > 0


def test_window_head_is_never_checked_first():
    """VERDICT r7 task 2: the correctness-window rotation must be mechanical.

    The driver checks the first ~_WINDOW queries returned by queries(); the
    registry computes that order from the checked-in CORRECTNESS_r*.json
    artifacts. Invariant: the first min(window, #never-checked) names are all
    queries with NO driver row in any artifact — a regression to a stale
    hand-edited order (the r6 AND r7 defect) fails here."""
    from big_data_medical_analysis_spark import registry

    latest = registry.latest_driver_rounds()
    ordered = list(registry.all_queries())
    never = [n for n in ordered if n not in latest]
    head = ordered[: min(registry._WINDOW, len(never))]
    rechecked = [n for n in head if n in latest]
    assert rechecked == [], f"window head wastes slots on already-checked: {rechecked}"
    # deferred names are still never-checked, so they must immediately follow
    # the window head (no checked query may outrank a never-checked one)
    overflow = ordered[len(head) : len(never)]
    assert all(n not in latest for n in overflow), overflow


def test_defer_list_names_all_resolve():
    """Every name in _DEFER_WITHIN_NEVER_CHECKED must be a registered
    query — a typo silently matches nothing, so the intended query is NOT
    deferred and a different never-checked query drops out of the window
    while both ordering invariant tests stay green (the silent-slot-
    forfeit failure the old _PRIORITY resolve test used to catch)."""
    from big_data_medical_analysis_spark import registry

    registry._load_all()
    unknown = [
        n
        for n in registry._DEFER_WITHIN_NEVER_CHECKED
        if n not in registry._REGISTRY
    ]
    assert unknown == []


def test_priority_after_window_is_stalest_first():
    """Beyond the never-checked block, priority is two stalest-first tiers
    (VERDICT r7 task 2 + r9 task 1): first every query whose code changed
    AFTER its latest driver row (unverified path — jumps the plain-stale
    queue), then everything else; each tier itself ordered by latest
    driver round ascending."""
    from big_data_medical_analysis_spark import registry

    latest = registry.latest_driver_rounds()
    ordered = [n for n in registry.all_queries() if n in latest]
    changed = [
        n
        for n in ordered
        if latest[n] < registry._CODE_CHANGED_ROUND.get(n, 0)
    ]
    plain = [n for n in ordered if n not in set(changed)]
    # tier order: all code-changed before any plain-stale
    assert ordered == changed + plain
    # stalest-first inside each tier
    for tier in (changed, plain):
        rounds = [latest[n] for n in tier]
        assert rounds == sorted(rounds)


def test_code_changed_dict_has_no_duplicate_literal_keys():
    """code-review r14: a dict literal keeps only the LAST occurrence of
    a repeated key, so a stale earlier entry is silently dead — and any
    future reorder/merge flips which round wins with no error. Parse the
    registry source and require each _CODE_CHANGED_ROUND key to appear
    exactly once (superseded entries are deleted; history lives in the
    comments)."""
    import ast
    import collections

    from big_data_medical_analysis_spark import registry as reg_mod

    src = open(reg_mod.__file__).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.AnnAssign)
            and getattr(node.target, "id", "") == "_CODE_CHANGED_ROUND"
        ) or (
            isinstance(node, ast.Assign)
            and any(
                getattr(t, "id", "") == "_CODE_CHANGED_ROUND"
                for t in node.targets
            )
        ):
            keys = [k.value for k in node.value.keys]
            dupes = [
                k for k, c in collections.Counter(keys).items() if c > 1
            ]
            assert dupes == [], f"duplicate literal keys: {dupes}"
            return
    raise AssertionError("_CODE_CHANGED_ROUND literal not found")


def test_code_changed_names_are_registered():
    """Same typo-guard as the defer list: an unregistered name in
    _CODE_CHANGED_ROUND silently prioritizes nothing."""
    from big_data_medical_analysis_spark import registry

    registry._load_all()
    unknown = [
        n for n in registry._CODE_CHANGED_ROUND if n not in registry._REGISTRY
    ]
    assert unknown == []


def test_every_query_has_scale_documentation():
    """Each registered operator's docstring is the judge's parity/scale
    evidence — empty docs are registration bugs."""
    from big_data_medical_analysis_spark import registry

    undocumented = [
        n for n, q in registry.all_queries().items() if len(q.doc) < 40
    ]
    assert undocumented == []


def test_rows_only_registrations_match_census():
    """VERDICT r8 task 5: the oracle discipline ("full DuckDB oracle unless
    impossible") is pinned mechanically. Every query registered with
    ``oracle=None`` must carry an entry (name + one-line reason) in
    ``rows_only_census.ROWS_ONLY_CENSUS``, and the census may not list
    queries that have an oracle or don't exist — so neither a silent new
    rows-only registration nor a stale census line can land."""
    from big_data_medical_analysis_spark import registry
    from big_data_medical_analysis_spark.rows_only_census import (
        ROWS_ONLY_CENSUS,
    )

    rows_only = {n for n, q in registry.all_queries().items() if q.oracle is None}
    uncensused = rows_only - set(ROWS_ONLY_CENSUS)
    stale = set(ROWS_ONLY_CENSUS) - rows_only
    assert uncensused == set(), f"rows-only without census reason: {uncensused}"
    assert stale == set(), f"census lists non-rows-only queries: {stale}"
    empty = [n for n, why in ROWS_ONLY_CENSUS.items() if len(why.strip()) < 10]
    assert empty == [], f"census reasons too thin: {empty}"


def test_rotation_growth_cap():
    """VERDICT r10 task 1, the written rotation rule made mechanical: the
    next driver window (first _WINDOW names of the priority order) must
    contain EVERY query the rotation owes a row — never-driver-checked
    queries and queries whose code changed after their latest driver row.
    Registering more new queries than the window has spare slots evicts
    an owed query and fails here, so the verification lag rounds 8–10
    accumulated (+56 queries vs 50 slots → 6 never-checked, a 19-query
    r5-stale tail) can never rebuild silently.

    Round-13 amendment: the FLOOR-stale tail (queries whose latest row
    sits at the oldest round present) is owed BEST-EFFORT, not hard —
    when the floor cohort alone approaches the window (48 r7 rows at the
    r13 start), ANY mandated change would otherwise be forbidden, and
    VERDICT r12 explicitly budgeted 5 owed slots ahead of the floor
    drain ("items #1/#2 will owe slots — budget them first"). The hard
    guarantees stay hard: never-checked and code-changed-stale queries
    must ALL sit inside the window; floor-stale queries may spill past
    it ONLY up to the hard-owed count (new work displaces at most its
    own size), and the spilled ones must be exactly the next names after
    the window — first in line for the following round, so the tail
    drains mechanically and can never silently rebuild."""
    from big_data_medical_analysis_spark import registry

    latest = registry.latest_driver_rounds()
    ordered = list(registry.all_queries())
    floor = min(latest.values()) if latest else 0
    hard_owed = [
        n
        for n in ordered
        if n not in latest
        or latest[n] < registry._CODE_CHANGED_ROUND.get(n, 0)
    ]
    floor_owed = [
        n for n in ordered if latest.get(n) == floor and n not in hard_owed
    ]
    assert len(hard_owed) <= registry._WINDOW, (
        f"{len(hard_owed)} hard-owed queries exceed the "
        f"{registry._WINDOW}-slot window; stop registering new queries"
    )
    # hard-owed queries are never evicted from the next window
    window = set(ordered[: registry._WINDOW])
    evicted = [n for n in hard_owed if n not in window]
    assert evicted == [], f"hard-owed queries evicted: {evicted}"
    # floor-stale spillover is bounded by the round's own change budget…
    spill = [n for n in floor_owed if n not in window]
    assert len(spill) <= len(hard_owed), (
        f"{len(spill)} floor-stale queries spill past the window but only "
        f"{len(hard_owed)} slots were spent on new/changed work — the "
        "tail is shrinking slower than the change budget allows"
    )
    # …and the spilled names are exactly the next in priority order, so
    # they lead the following round's window
    assert ordered[registry._WINDOW : registry._WINDOW + len(spill)] == spill


def test_bench_cohorts_cover_registry():
    """VERDICT r10 task 4: every registered query must have a wall-clock
    trend — bench cohort membership ∪ headline ≡ the whole registry, no
    duplicates across cohorts, no stale names."""
    import importlib.util as ilu

    from big_data_medical_analysis_spark import registry

    spec = ilu.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(_ENTRY_PATH), "bench.py")
    )
    bench = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    regs = set(registry.queries())
    headline = set(bench.HEADLINE)
    cohort_names = [n for members in bench.COHORTS.values() for n in members]
    dupes = {n for n in cohort_names if cohort_names.count(n) > 1}
    assert dupes == set(), f"queries in multiple cohorts: {dupes}"
    covered = headline | set(cohort_names)
    assert covered - regs == set(), f"bench names not registered: {covered - regs}"
    assert regs - covered == set(), f"registered but unbenched: {regs - covered}"


def test_spec_docs_name_every_registered_query():
    """VERDICT r10 task 7 made permanent: the spec may never lag the
    registry — every registered query name must appear verbatim in
    SURVEY.md or COVERAGE.md (COVERAGE carries the row-by-row operator→
    query mapping the judge audits). A query registered without a spec
    row fails here in the round that adds it."""
    from big_data_medical_analysis_spark import registry

    root = os.path.dirname(_ENTRY_PATH)
    docs = ""
    for f in ("SURVEY.md", "COVERAGE.md"):
        with open(os.path.join(root, f)) as fh:
            docs += fh.read()
    unmapped = [n for n in registry.queries() if n not in docs]
    assert unmapped == [], f"registered queries missing from spec docs: {unmapped}"


def test_priority_order_pure_logic(monkeypatch):
    """The rotation sort itself, on synthetic artifacts: never-checked
    first (registration order, deferred names at the block's tail), then
    checked stalest-round-first with registration-order ties."""
    from big_data_medical_analysis_spark import registry

    monkeypatch.setattr(
        registry, "latest_driver_rounds", lambda: {"b": 3, "d": 2, "f": 2}
    )
    monkeypatch.setattr(
        registry, "_DEFER_WITHIN_NEVER_CHECKED", ("c",), raising=True
    )
    order = registry._priority_order(["a", "b", "c", "d", "e", "f"])
    # a, e never-checked (registration order); c never-checked but deferred;
    # d and f stalest (r2, registration order); b freshest (r3)
    assert order == ["a", "e", "c", "d", "f", "b"]


def test_heavy_verdict_judges_documented_bounds():
    """tools/scale_probe.heavy_verdict_text (round 12): members are judged
    against their DOCUMENTED bound — m for linear-in-corpus members, m²
    for the deliberately fixed-geometry ANN probe — so a known cost model
    is reported as such while anything beyond its own bound still flags
    as a regression."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "scale_probe_mod",
        os.path.join(os.path.dirname(_ENTRY_PATH), "tools", "scale_probe.py"),
    )
    sp = ilu.module_from_spec(spec)
    spec.loader.exec_module(sp)

    base = {
        "minhash_incremental_probe": 10.0,
        "ann_recall_audit": 2.7,
        "prefix_filter_jaccard_join": 10.8,
        "governed_mixture_sample": 69.2,
    }
    # ANN probe above the multiplier but inside its m^2 bound: reported
    # against the documented bound, NOT flagged as a regression
    ok = sp.heavy_verdict_text({**base, "ann_incremental_probe": 172.7}, 100)
    assert "regression" not in ok.lower()
    assert "documented 10000x" in ok
    assert "governed_mixture_sample" in ok  # max linear-bound member named
    # beyond the m^2 bound: flagged loudly
    bad = sp.heavy_verdict_text(
        {**base, "ann_incremental_probe": 20_000.0}, 100
    )
    assert "regression to bisect" in bad
    assert "ann_incremental_probe" in bad
    # a linear member above m: flagged
    bad2 = sp.heavy_verdict_text(
        {**base, "governed_mixture_sample": 130.0,
         "ann_incremental_probe": 172.7}, 100
    )
    assert "regression to bisect" in bad2 and "governed_mixture_sample" in bad2
    # capped member (round 14, VERDICT r13 task 3): absent from the
    # top-tier ratios, reported via its ceiling measurement + the retired
    # r13 record — never re-proved at 100x, never misread as a regression
    cap = sp.heavy_verdict_text(
        base, 100, {"ann_incremental_probe": (30, 29.9)}
    )
    assert "regression" not in cap.lower()
    assert "30x ceiling" in cap and "197x probe wall at 100x" in cap
