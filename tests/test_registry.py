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


def test_bench_compare_block_mechanics(tmp_path, monkeypatch):
    """The r9 mechanical drift envelope: _prior_artifact picks the
    highest committed round at the SAME sf (unwrapping driver-style
    'parsed' wrappers), and _compare_block flags beyond_envelope only
    when BOTH cal-normalized ratios exceed 1.2."""
    import json

    import bench

    # isolated artifact dir: bench._prior_artifact scans bench.py's dir
    (tmp_path / "bench.py").write_text("")
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 19\n")
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({
        "parsed": {"sf": 0.1, "queries": {"q": 1.0, "r": 1.0},
                   "cal_1t_mbps": 1000, "cal_all_mbps": 8000}}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({
        "sf": 0.1, "queries": {"q": 9.0}, "cal_1t_mbps": 1000,
        "cal_all_mbps": 8000}))
    (tmp_path / "BENCH_r9_sf1.json").write_text(json.dumps({
        "sf": 1.0, "queries": {"q": 5.0}, "cal_1t_mbps": 1000,
        "cal_all_mbps": 8000}))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))

    cal = {"cal_1t_mbps": 1000, "cal_all_mbps": 8000,
           "cal_effective_cores": 8}
    # picks r03 (not r02) for sf 0.1, unwraps "parsed"
    blk = bench._compare_block({"q": 2.0, "r": 1.1, "new": 3.0}, cal, 0.1)
    assert blk["baseline"] == "BENCH_r03.json"
    assert blk["queries"]["q"]["ratio_raw"] == 2.0
    assert blk["queries"]["q"]["beyond_envelope"] is True
    assert blk["beyond_envelope"] == ["q"]
    assert "beyond_envelope" not in blk["queries"]["r"]  # 1.1 < 1.2
    assert "new" not in blk["queries"]  # no prior entry, no ratio
    # same raw ratio survives when the window is FASTER (cal up) ...
    fast = dict(cal, cal_1t_mbps=2000, cal_all_mbps=16000)
    blk2 = bench._compare_block({"q": 0.7}, fast, 0.1)
    assert blk2["queries"]["q"]["ratio_norm_1t"] == 1.4  # 0.7 * 2
    # ... and the sf filter routes to the sf1 artifact
    blk3 = bench._compare_block({"q": 5.0}, cal, 1.0)
    assert blk3["baseline"] == "BENCH_r9_sf1.json"
    # no artifact at this sf -> no block
    assert bench._compare_block({"q": 1.0}, cal, 0.005) is None


def test_bench_insensitive_window_annotation(tmp_path, monkeypatch):
    """r13 (r12 ADVICE): when the run's window is measurably faster
    than the baseline's (cal ratio > 1.25), long-query (>=1s) flags
    are structurally suppressed by the raw>1.2 requirement — the
    compare block must SAY so instead of reading as a clean bill."""
    import json

    import bench

    (tmp_path / "bench.py").write_text("")
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 19\n")
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({
        "sf": 0.1, "queries": {"q": 2.0}, "cal_1t_mbps": 1000,
        "cal_all_mbps": 8000}))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))

    same = {"cal_1t_mbps": 1000, "cal_all_mbps": 8000,
            "cal_effective_cores": 8}
    blk = bench._compare_block({"q": 2.0}, same, 0.1)
    assert "long_query_flags_insensitive_below" not in blk

    fast = {"cal_1t_mbps": 2000, "cal_all_mbps": 16000,
            "cal_effective_cores": 8}
    blk2 = bench._compare_block({"q": 1.5}, fast, 0.1)
    # a genuine 1.5x work regression reads raw 0.75 here — unflaggable
    assert blk2["beyond_envelope"] == []
    assert blk2["long_query_flags_insensitive_below"] == 2.4  # 1.2 * 2
    assert "insensitive" in blk2["insensitive_note"].replace(
        "unflaggable", "insensitive"
    ) or "unflaggable" in blk2["insensitive_note"]


def test_bench_prior_artifact_excludes_current_round(tmp_path):
    """r11 (r10 verdict #3): the compare baseline must come from a
    PRIOR round — r10's committed compare blocks named themselves as
    baseline because a same-round artifact was the newest usable file.
    VERDICT.md's header pins the current round (judge round + 1)."""
    import json

    import bench

    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 10\n")
    good = {"sf": 0.1, "queries": {"q": 1.0},
            "cal_1t_mbps": 1000, "cal_all_mbps": 8000}
    (tmp_path / "BENCH_r10_sf0.1.json").write_text(json.dumps(good))
    # same-round artifact (this round = 11): newest + usable, but banned
    (tmp_path / "BENCH_r11_sf0.1.json").write_text(
        json.dumps(dict(good, queries={"q": 99.0})))

    fname, data, skipped = bench._prior_artifact(0.1, here=str(tmp_path))
    assert fname == "BENCH_r10_sf0.1.json"
    assert data["queries"] == {"q": 1.0}
    # the banned file is excluded, not "skipped-as-unusable"
    assert skipped == []


def test_bench_compact_line_fits_driver_tail():
    """r11 (r10 verdict #2): the final stdout line must survive the
    driver's ~2 KB tail truncation — full contract fields when small,
    graceful trimming (flagged names → digest → queries) when not."""
    import json

    import bench

    out = {
        "metric": "headline query wall time at sf0.1", "value": 30.0,
        "unit": "sec", "sf": 0.1, "cal_1t_mbps": 500, "cal_all_mbps": 4000,
        "cal_effective_cores": 8.0,
        "queries": {f"query_name_number_{i:02d}": 1.234 for i in range(38)},
        "compare": {
            "baseline": "BENCH_r10_sf0.1.json",
            "beyond_envelope": ["query_name_number_03"],
            "queries": {f"query_name_number_{i:02d}": {
                "ratio_raw": 1.0 + i, "ratio_norm_all": 0.5 + i}
                for i in range(38)},
        },
    }
    line = bench._compact_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed  # the driver contract survives
    assert parsed["compare_digest"]["n_flagged"] == 1
    # each flag and worst-entry carries BOTH raw and normalized ratios
    # (r11 verdict #2: the digest is the judge's evidence)
    assert parsed["compare_digest"]["flagged"] == {
        "query_name_number_03": [4.0, 3.5]}
    assert len(parsed["compare_digest"]["worst3_raw_norm"]) == 3
    assert parsed["compare_digest"]["worst3_raw_norm"][
        "query_name_number_37"] == [38.0, 37.5]
    # pathological size: falls back but stays parseable + under budget
    huge = dict(out, queries={f"q{i}": 1.0 for i in range(500)})
    huge["compare"] = None
    line2 = bench._compact_line(huge)
    assert len(line2) <= 1900
    assert json.loads(line2)["queries"] == {"omitted_for_size": 500}


def test_bench_prior_artifact_skips_unusable_driver_files(tmp_path):
    """r10 (r9 verdict #8): driver-recorded artifacts can be unusable
    — truncated stdout tails (invalid JSON) or 'parsed: null' wrappers
    — and the loader must fall back to the newest USABLE artifact at
    the same SF, reporting the skipped newer files so the compare
    block can say which baselines were passed over."""
    import json

    import bench

    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 9\n")
    (tmp_path / "BENCH_r07.json").write_text(json.dumps({
        "sf": 0.1, "queries": {"q": 1.0},
        "cal_1t_mbps": 1000, "cal_all_mbps": 8000}))
    # newer but unusable: parsed is null (the r9 driver shape)
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(
        {"parsed": None, "stdout_tail": "..."}))
    # newer but unusable: truncated tail = invalid JSON
    (tmp_path / "BENCH_r08.json").write_text('{"parsed": {"sf": 0.1, "que')

    fname, data, skipped = bench._prior_artifact(0.1, here=str(tmp_path))
    assert fname == "BENCH_r07.json"
    assert data["queries"] == {"q": 1.0}
    assert skipped == ["BENCH_r08.json", "BENCH_r09.json"]

    # an OLDER unusable file is not worth reporting (it lost anyway)
    (tmp_path / "BENCH_r01.json").write_text("garbage")
    _, _, skipped2 = bench._prior_artifact(0.1, here=str(tmp_path))
    assert "BENCH_r01.json" not in skipped2

    # nothing usable at all -> None
    assert bench._prior_artifact(7.7, here=str(tmp_path)) is None


def test_bench_flag_rule_splits_on_prior_second(tmp_path, monkeypatch):
    """r12 (r11 verdict #2): sub-second priors flag on the NORMALIZED
    ratios alone (raw is scheduling-overhead noise in a starved
    window); priors >= 1 s additionally require the RAW ratio beyond
    the envelope (a long query's regression must show up raw — pure
    cal normalization must not fabricate a flag in a fast window)."""
    import json

    import bench

    (tmp_path / "bench.py").write_text("")
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 19\n")
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({
        "sf": 0.1,
        "queries": {"short": 0.4, "long": 5.0, "short_ok": 0.4},
        "cal_1t_mbps": 1000, "cal_all_mbps": 4000}))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))

    # starved window (half capacity): raw 2x == norm 1x for short_ok;
    # short at raw 3x (norm 1.5x) flags; long at raw 1.3x but norm
    # 0.65x does NOT (norm gate still required for >= 1 s)
    slow = {"cal_1t_mbps": 500, "cal_all_mbps": 2000,
            "cal_effective_cores": 4}
    blk = bench._compare_block(
        {"short": 1.2, "long": 6.5, "short_ok": 0.8}, slow, 0.1)
    assert blk["beyond_envelope"] == ["short"]
    assert blk["queries"]["short"]["ratio_raw"] == 3.0
    assert blk["queries"]["short"]["ratio_norm_all"] == 1.5

    # fast window (double capacity): long at raw 1.1x would be norm
    # 2.2x — the >= 1 s raw gate keeps it unflagged; short at raw 1.1x
    # (norm 2.2x) DOES flag (sub-second trusts only normalized)
    fast = {"cal_1t_mbps": 2000, "cal_all_mbps": 8000,
            "cal_effective_cores": 4}
    blk2 = bench._compare_block({"long": 5.5, "short": 0.44}, fast, 0.1)
    assert blk2["beyond_envelope"] == ["short"]
    assert "beyond_envelope" not in blk2["queries"]["long"]
    # and a real regression (raw AND norm beyond) still flags long
    blk3 = bench._compare_block({"long": 15.0}, slow, 0.1)
    assert blk3["beyond_envelope"] == ["long"]


def test_bench_prior_artifact_none_round_fallback(tmp_path):
    """r12 (r11 ADVICE): with VERDICT.md missing, the same-round filter
    must not silently vanish — the max-numbered artifact round is
    conservatively treated as current, so a run can never baseline
    against a same-round file (the r10 self-baseline bug)."""
    import json

    import bench

    good = {"sf": 0.1, "queries": {"q": 1.0},
            "cal_1t_mbps": 1000, "cal_all_mbps": 8000}
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(good))
    (tmp_path / "BENCH_r08_sf0.1.json").write_text(
        json.dumps(dict(good, queries={"q": 99.0})))

    assert bench._current_round(here=str(tmp_path)) is None
    fname, data, _ = bench._prior_artifact(0.1, here=str(tmp_path))
    assert fname == "BENCH_r07.json"  # max round (8) excluded
    assert data["queries"] == {"q": 1.0}
