"""Registry hygiene: the driver contract depends on the registry's
shape, so pin it — a renamed query must not silently fall out of the
priority window, and every oracle must target a registered query."""

from __future__ import annotations

from mapreduce_citation_spark import registry


def test_priority_names_all_registered():
    """Every _PRIORITY name resolves — a rename that orphans one would
    silently shrink the prefix an external checker samples."""
    specs = registry.all_specs()
    missing = [n for n in registry._PRIORITY if n not in specs]
    assert not missing, f"priority entries not registered: {missing}"


def test_priority_window_covers_every_family():
    """EVERY operator family (first tag, relational-shape tags
    coalesced) has at least one representative in the first-50 window
    the driver samples — a rotation can't silently drop one."""
    missing = registry.missing_families()
    assert not missing, f"families with no window representative: {missing}"
    # and the reference's own surface leads the window
    first = list(registry.all_specs())[:3]
    assert first == ["citation_counts", "top_cited", "citing_papers"]


def test_missing_families_detects_bad_rotation():
    """The invariant actually bites: a synthetic window that drops
    every dq query must be reported as missing the dq family."""
    specs = registry.all_specs()
    bad = [n for n in specs if registry.family_of(specs[n]) != "dq"]
    assert "dq" in registry.missing_families(bad)
    # and the real window plus nothing extra is exactly clean
    assert registry.missing_families(list(specs)) == set()


def test_no_orphan_oracles_and_unique_names():
    specs = registry.all_specs()
    oracles = registry.oracle_sql()
    assert set(oracles) <= set(specs)
    assert len(specs) == len(set(specs))  # dict, but double-check count
    assert len(specs) >= 100
