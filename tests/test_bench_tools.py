"""Bench tooling invariants (VERDICT r7 "Next round" #3, ADVICE r7):
floor min-merging happens in NORMALIZED space with per-query floor
canaries, bench_diff normalizes each query by its own floor's canary,
refuses mismatched canary sets, and separates the pure-JVM sentinel
ratio from the scan-canary ratio. Pure-Python — no Spark session."""

import importlib.util
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault(name, mod)
    spec.loader.exec_module(mod)
    return mod


bench_diff = _load("bench_diff")
floor_merge = _load("bench_floor_merge")

CANARY_SET = ["a_canary", "b_canary"]


def _doc(queries, scan_total, sentinel, floor_canary=None):
    d = {
        "queries": queries,
        "canary": {
            "queries": {q: scan_total / len(CANARY_SET) for q in CANARY_SET},
            "set": CANARY_SET,
            "scan_total": scan_total,
            "range_sentinel_s": sentinel,
            "total": scan_total + sentinel,
        },
    }
    if floor_canary:
        d["floor_canary"] = floor_canary
    return d


class TestFloorMerge:
    def test_mixed_session_merge_is_normalized(self):
        # fast session (canary 2.0) measured q1=1.0s; slow session
        # (canary 4.0 = box 2x slower) measured q1=1.5s. RAW min-merge
        # would keep 1.0; NORMALIZED compare sees 1.0/2.0=0.5 vs
        # 1.5/4.0=0.375 -> the slow session's floor is actually the
        # faster machine-relative measurement and must win.
        old = _doc({"q1": 1.0, "q2": 0.2}, scan_total=2.0, sentinel=0.2)
        new = _doc({"q1": 1.5, "q2": 0.6}, scan_total=4.0, sentinel=0.4)
        merged = floor_merge.merge(old, new)
        assert merged["queries"]["q1"] == 1.5
        assert merged["floor_canary"]["q1"] == 4.0
        # q2: 0.2/2.0=0.1 beats 0.6/4.0=0.15 -> old floor kept, WITH
        # its own session canary
        assert merged["queries"]["q2"] == 0.2
        assert merged["floor_canary"]["q2"] == 2.0

    def test_merge_carries_existing_floor_canaries(self):
        # an old floor that itself came from a third session keeps that
        # session's canary through subsequent merges
        old = _doc({"q1": 0.5}, scan_total=2.0, sentinel=0.2,
                   floor_canary={"q1": 1.0})
        new = _doc({"q1": 0.9, "q3": 0.3}, scan_total=2.0, sentinel=0.2)
        merged = floor_merge.merge(old, new)
        # 0.5/1.0=0.5 vs 0.9/2.0=0.45 -> new wins despite larger raw
        assert merged["queries"]["q1"] == 0.9
        assert merged["floor_canary"]["q1"] == 2.0
        # query only in the new run enters with the new session canary
        assert merged["queries"]["q3"] == 0.3
        assert merged["floor_canary"]["q3"] == 2.0

    def test_merge_refuses_mismatched_canary_sets(self):
        old = _doc({"q1": 1.0}, 2.0, 0.2)
        old["canary"]["set"] = ["other_canary"]
        new = _doc({"q1": 1.0}, 2.0, 0.2)
        with pytest.raises(SystemExit):
            floor_merge.merge(old, new)


class TestDiff:
    def test_per_query_floor_canary_normalization(self):
        # floor set on a session with canary 1.0; current session's
        # canary is 3.0 (box 3x slower). q1 raw 3.1s vs floor 1.0s
        # looks like a 3.1x regression un-normalized, but per-floor
        # normalization divides by 3.0 -> adj 1.033, inside the gate.
        old = _doc({"q1": 1.0}, scan_total=2.0, sentinel=0.2,
                   floor_canary={"q1": 1.0})
        new = _doc({"q1": 3.1}, scan_total=3.0, sentinel=0.3)
        res = bench_diff.diff(old, new)
        assert not res["regressions"], res
        # same raw timing but the floor's own session was the SLOW one
        # (floor canary 3.0, new canary 3.0 -> ratio 1.0): now 3.1s vs
        # a 1.0s floor is a genuine regression
        old2 = _doc({"q1": 1.0}, scan_total=2.0, sentinel=0.2,
                    floor_canary={"q1": 3.0})
        res2 = bench_diff.diff(old2, new)
        assert [r[0] for r in res2["regressions"]] == ["q1"]

    def test_set_mismatch_refuses_normalization(self):
        old = _doc({"q1": 1.0}, 2.0, 0.2)
        old["canary"]["set"] = ["other"]
        new = _doc({"q1": 1.2}, 8.0, 0.2)  # would clamp to 4x if trusted
        res = bench_diff.diff(old, new)
        assert res["ratio"] == 1.0
        assert any("REFUSED" in m for m in res["messages"])

    def test_sentinel_divergence_warns(self):
        # scans 3x slower, CPU sentinel flat -> the ADVICE r7 warning
        old = _doc({"q1": 1.0}, scan_total=2.0, sentinel=0.2)
        new = _doc({"q1": 1.0}, scan_total=6.0, sentinel=0.21)
        res = bench_diff.diff(old, new)
        assert any("sentinel" in m and "WARNING" in m for m in res["messages"])

    def test_legacy_total_backward_compat(self):
        # pre-round-8 docs: no scan_total, no set -> scan derived as
        # total - sentinel, set derived from canary queries
        old = _doc({"q1": 1.0}, 2.0, 0.2)
        del old["canary"]["scan_total"]
        del old["canary"]["set"]
        new = _doc({"q1": 1.1}, 2.0, 0.2)
        res = bench_diff.diff(old, new)
        info = bench_diff.canary_info(old)
        assert info["scan"] == pytest.approx(2.0)
        assert not res["regressions"]


def _drift_doc(queries, scan_total, sentinel, drift_probe, drift_index):
    d = _doc(queries, scan_total, sentinel)
    d["canary"]["drift_probe"] = drift_probe
    d["canary"]["drift_index"] = drift_index
    return d


class TestDriftNormalization:
    def test_mid_session_slow_phase_produces_no_false_flags(self):
        # Floors measured on a steady box (canary 2.0). The new session
        # STARTS at the same speed (scan canaries 2.0, probe 0.1) but a
        # mid-session phase doubles the box time: the probe nearest q_mid
        # reads 0.2. q_mid's raw time doubled with the box — the r8
        # failure mode that start-canary normalization flags falsely.
        old = _doc({"q_early": 1.0, "q_mid": 1.0}, scan_total=2.0,
                   sentinel=0.2, floor_canary={"q_early": 2.0, "q_mid": 2.0})
        new = _drift_doc(
            {"q_early": 1.0, "q_mid": 2.2}, scan_total=2.0, sentinel=0.2,
            drift_probe=[0.1, 0.1, 0.2],
            drift_index={"q_early": 0, "q_mid": 2},
        )
        res = bench_diff.diff(old, new)
        assert not res["regressions"], res

    def test_genuine_regression_still_flags_during_slow_phase(self):
        # same slow phase, but the query ran 5x — far past the 2x the
        # box explains; drift normalization must NOT absorb it
        old = _doc({"q_mid": 1.0}, scan_total=2.0, sentinel=0.2,
                   floor_canary={"q_mid": 2.0})
        new = _drift_doc(
            {"q_mid": 5.0}, scan_total=2.0, sentinel=0.2,
            drift_probe=[0.1, 0.1, 0.2], drift_index={"q_mid": 2},
        )
        res = bench_diff.diff(old, new)
        assert [r[0] for r in res["regressions"]] == ["q_mid"]

    def test_drift_factor_defaults_on_legacy_docs(self):
        legacy = _doc({"q1": 1.0}, 2.0, 0.2)
        assert bench_diff.drift_factor(legacy, "q1") == 1.0
        bad = _drift_doc({"q1": 1.0}, 2.0, 0.2,
                         drift_probe=[0.0, 0.1], drift_index={"q1": 1})
        assert bench_diff.drift_factor(bad, "q1") == 1.0  # zero base probe

    def test_floor_merge_stores_drift_effective_canary(self):
        # a new floor set during a MILD (<=1.5x) slow phase is adopted
        # with the re-priced canary (scan 2.0 * factor 1.4 = 2.8), so
        # later sessions compare against the regime that measured it
        old = _doc({"q_mid": 9.9}, scan_total=2.0, sentinel=0.2,
                   floor_canary={"q_mid": 2.0})
        new = _drift_doc(
            {"q_mid": 2.0}, scan_total=2.0, sentinel=0.2,
            drift_probe=[0.1, 0.14], drift_index={"q_mid": 1},
        )
        merged = floor_merge.merge(old, new)
        assert merged["queries"]["q_mid"] == 2.0
        assert merged["floor_canary"]["q_mid"] == pytest.approx(2.8)

    def test_floor_merge_refuses_drift_spiked_floors(self):
        # round-11 phantom-floor guard: a probe claiming a >1.5x slow
        # block makes any near-normal raw in it look impossibly good in
        # normalized space (the r10 driver session planted 19 such
        # floors; all re-flagged CONFIRMED a round later). Keep the old
        # floor; a NEW-only query still lands (nothing to corrupt).
        old = _doc({"q_mid": 2.5}, scan_total=2.0, sentinel=0.2,
                   floor_canary={"q_mid": 2.0})
        new = _drift_doc(
            {"q_mid": 2.0, "q_new": 1.0}, scan_total=2.0, sentinel=0.2,
            drift_probe=[0.1, 0.2],
            drift_index={"q_mid": 1, "q_new": 1},
        )
        merged = floor_merge.merge(old, new)
        assert merged["queries"]["q_mid"] == 2.5      # spiked-block floor refused
        assert merged["floor_canary"]["q_mid"] == 2.0
        assert merged["queries"]["q_new"] == 1.0      # new-only query kept
        assert merged["floor_canary"]["q_new"] == 4.0


class TestRunDocSeparation:
    def test_bench_writes_run_file_not_floors_doc(self):
        """VERDICT r8 #1 regression guard: bench.py's only write target
        is BENCH_RUN.json; the floors doc is bench_floor_merge.py's."""
        repo = os.path.dirname(SCRIPTS)
        src = open(os.path.join(repo, "bench.py")).read()
        import re
        opens = re.findall(r"open\(([^)]*)\)", src)
        assert not any("BENCH_DETAIL" in o for o in opens), opens
        assert 'RUN_PATH = os.path.join(' in src
        assert '"BENCH_RUN.json"' in src
        # and the merge tool writes the floors doc
        msrc = open(os.path.join(SCRIPTS, "bench_floor_merge.py")).read()
        assert '"BENCH_DETAIL.json"' in msrc


class TestAutoTriage:
    """Round-10 (VERDICT r9 #6): the gate's flags are re-judged by a
    fresh-JVM triage session — flags→triage→exit-0 without the manual
    bench_triage pass."""

    def _flags(self):
        # floors set on a fast box (canary 2.0); the new session hit a
        # slow phase (canary still 2.0 — the probe under-sampled it) so
        # q_slow and q_also measured 5x their floors; q_real genuinely
        # regressed (plan change) and will ALSO reproduce under triage.
        old = _doc(
            {"q_slow": 1.0, "q_also": 0.4, "q_real": 1.0, "q_ok": 0.5},
            scan_total=2.0, sentinel=0.2,
            floor_canary={"q_slow": 2.0, "q_also": 2.0, "q_real": 2.0},
        )
        new = _doc(
            {"q_slow": 5.0, "q_also": 2.0, "q_real": 5.0, "q_ok": 0.5},
            scan_total=2.0, sentinel=0.2,
        )
        res = bench_diff.diff(old, new)
        assert res["fail"]
        assert {n for n, *_ in res["regressions"]} == {
            "q_slow", "q_also", "q_real"
        }
        return old, new, res

    def test_environmental_flags_clear_and_real_one_confirms(self):
        old, new, res = self._flags()
        # fresh JVM at the floors' box speed: the environmental flags
        # re-measure at their floors, the real regression reproduces
        triage = {
            "scan_total": 2.0,
            "queries": {"q_slow": 1.05, "q_also": 0.38, "q_real": 4.9},
        }
        cleared, confirmed = bench_diff.triage_verdicts(
            old, res["regressions"], triage
        )
        assert {n for n, *_ in cleared} == {"q_slow", "q_also"}
        assert {n for n, *_ in confirmed} == {"q_real"}

    def test_triage_normalizes_by_floor_canary_box_regime(self):
        old, new, res = self._flags()
        # triage session itself ran on a 2x-slower box (scan 4.0 vs the
        # floors' 2.0): raw medians are 2x the floors but NORMALIZED
        # they sit at the floor -> still cleared
        triage = {
            "scan_total": 4.0,
            "queries": {"q_slow": 2.0, "q_also": 0.8, "q_real": 9.8},
        }
        cleared, confirmed = bench_diff.triage_verdicts(
            old, res["regressions"], triage
        )
        assert {n for n, *_ in cleared} == {"q_slow", "q_also"}
        assert {n for n, *_ in confirmed} == {"q_real"}

    def test_missing_measurement_never_clears(self):
        old, new, res = self._flags()
        triage = {"scan_total": 2.0, "queries": {"q_slow": 1.0}}
        cleared, confirmed = bench_diff.triage_verdicts(
            old, res["regressions"], triage
        )
        assert {n for n, *_ in cleared} == {"q_slow"}
        assert {n for n, *_ in confirmed} == {"q_also", "q_real"}

    def test_apply_triage_reuses_covering_stamped_block(self):
        old, new, res = self._flags()
        new["triage"] = {
            "scan_total": 2.0,
            "queries": {"q_slow": 1.0, "q_also": 0.4, "q_real": 4.9},
        }
        calls = []

        def boom(names, sf_dir):  # must NOT be called
            calls.append(names)
            raise AssertionError("fresh triage run despite covering block")

        tri = bench_diff.apply_triage(old, new, res, run_triage=boom)
        assert not calls and tri["_reused"]
        assert tri["cleared"] == ["q_also", "q_slow"]
        assert tri["confirmed"] == ["q_real"]

    def test_apply_triage_runs_fresh_when_block_incomplete(self):
        old, new, res = self._flags()
        new["triage"] = {"scan_total": 2.0, "queries": {"q_slow": 1.0}}
        seen = {}

        def fake(names, sf_dir):
            seen["names"] = sorted(names)
            return {
                "scan_total": 2.0,
                "queries": {"q_slow": 1.0, "q_also": 0.4, "q_real": 1.0},
            }

        tri = bench_diff.apply_triage(
            old, new, res, run_triage=fake, sf_dir="/x"
        )
        assert seen["names"] == ["q_also", "q_real", "q_slow"]
        assert not tri["_reused"]
        assert tri["confirmed"] == []  # all cleared -> gate would exit 0


class TestSelfTriage:
    """Round-11 (VERDICT r10 #4): bench.py adjudicates its OWN session
    at close — a plain `python bench.py` run writes BENCH_RUN.json
    WITH the triage block, so bench_diff --triage reuses it and the
    driver's session record needs no judge-side manual pass."""

    def _bench_mod(self):
        repo = os.path.dirname(SCRIPTS)
        spec = importlib.util.spec_from_file_location(
            "bench_for_test", os.path.join(repo, "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _docs(self):
        old = _doc(
            {"q_slow": 1.0, "q_ok": 0.5},
            scan_total=2.0, sentinel=0.2,
            floor_canary={"q_slow": 2.0},
        )
        new = _doc(
            {"q_slow": 5.0, "q_ok": 0.5}, scan_total=2.0, sentinel=0.2
        )
        return old, new

    def test_stamps_block_into_run_file(self, tmp_path):
        import json as _json

        bench = self._bench_mod()
        old, new = self._docs()
        run_path = tmp_path / "BENCH_RUN.json"
        run_path.write_text(_json.dumps(new))

        def fake(names, sf_dir):
            assert sorted(names) == ["q_slow"]
            return {"scan_total": 2.0, "queries": {"q_slow": 1.0}}

        block = bench.self_triage(new, str(run_path), run_triage=fake, old_doc=old)
        assert block and block["cleared"] == ["q_slow"]
        assert block["confirmed"] == []
        stamped = _json.loads(run_path.read_text())
        assert stamped["triage"]["cleared"] == ["q_slow"]
        # bench_diff --triage must now reuse the stamped block (exit 0
        # path) without a fresh measurement
        res = bench_diff.diff(old, stamped)
        tri = bench_diff.apply_triage(
            old, stamped, res,
            run_triage=lambda *a: (_ for _ in ()).throw(AssertionError("re-measured")),
        )
        assert tri["_reused"] and tri["confirmed"] == []

    def test_clean_gate_returns_none(self, tmp_path):
        bench = self._bench_mod()
        old, _ = self._docs()
        clean = _doc({"q_slow": 1.0, "q_ok": 0.5}, scan_total=2.0, sentinel=0.2)
        assert bench.self_triage(
            clean, str(tmp_path / "x.json"), run_triage=lambda *a: {}, old_doc=old
        ) is None
        assert not (tmp_path / "x.json").exists()

    def test_never_raises_on_triage_failure(self, tmp_path):
        bench = self._bench_mod()
        old, new = self._docs()

        def boom(names, sf_dir):
            raise RuntimeError("no JVM available")

        assert bench.self_triage(
            new, str(tmp_path / "y.json"), run_triage=boom, old_doc=old
        ) is None
        assert not (tmp_path / "y.json").exists()
