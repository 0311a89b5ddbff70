"""Guards for bench.py's driver-facing output contract.

The driver captures the last ~2000 characters of bench.py's stdout and
parses the final line as JSON. Round 4 lost its entire official bench
artifact (BENCH_r04.json parsed:null) because the single output line
grew past that window once per-draw diagnostics were added. These
tests pin the contract: the stdout headline stays compact no matter
how many draws/pairs the diagnostics carry, and the probe pin sets
derive from the real affinity mask instead of hard-coded core ids.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_full_result(n_draws_2: int = 8, n_draws_8: int = 24) -> dict:
    """A full result dict shaped like a worst-case real run: many
    draws, each with the window/steal/host-speed/stage diagnostics
    that blew past the tail capture in r4."""
    def draw(cpus, i):
        return {
            "cpus": cpus,
            "wall_sec": 123.456 + i,
            "t_start": 1787040167.3 + 100 * i,
            "t_end": 1787040239.1 + 100 * i,
            "steal_frac": 0.0002,
            "host_speed": 3839,
            "stages": {
                "A_profile": 117.47,
                "B_models": 3.28,
                "C_decide": 4.69,
                "D_metrics": 0.81,
            },
        }

    draws_2 = [draw(2, i) for i in range(n_draws_2)]
    draws_8 = [draw(8, i) for i in range(n_draws_8)]
    pairs = [
        {"t2_wall": 200.0 + i, "t8_walls": [55.0, 56.0, 57.0], "efficiency": 0.88}
        for i in range(n_draws_2)
    ]
    return {
        "metric": "headline_total_sec",
        "value": 49.712,
        "unit": "sec",
        "queries": {
            # the real HEADLINE list plus the pipeline row — the
            # actual keys, so the size bound tracks reality
            **{name: 3.141 for name in bench.HEADLINE},
            "clips_pipeline": 24.312,
        },
        "sf": 0.1,
        "n_clips": 200000,
        "clips_per_sec": 8215.3,
        "n_scale_clips": 400000,
        "clips_per_sec_n2": 1893.2,
        "clips_per_sec_4n8": 6742.1,
        "scaling_efficiency": 0.941,
        "scaling_efficiency_median": 0.888,
        "scale_pairs": pairs,
        "scale_draws_sec": {"cpus2": draws_2, "cpus8": draws_8},
    }


class TestCompactHeadline:
    def test_under_driver_tail_limit(self):
        # worst case: triple the r4 draw counts — compact line must
        # not depend on diagnostics volume at all
        full = _fake_full_result(n_draws_2=24, n_draws_8=72)
        line = json.dumps(bench._compact_headline(full))
        assert len(line) < 1900, f"compact headline is {len(line)} chars"

    def test_keeps_every_criterion_number(self):
        compact = bench._compact_headline(_fake_full_result())
        for key in (
            "metric",
            "value",
            "queries",
            "sf",
            "n_clips",
            "clips_per_sec",
            "clips_per_sec_n2",
            "clips_per_sec_4n8",
            "scaling_efficiency",
            "scaling_efficiency_median",
        ):
            assert key in compact, key
        # per-query timings survive intact (the driver diffs them
        # round-over-round)
        assert compact["queries"]["clips_pipeline"] == 24.312
        assert compact["scaling_efficiency"] == 0.941

    def test_drops_bulky_diagnostics(self):
        compact = bench._compact_headline(_fake_full_result())
        assert "scale_pairs" not in compact
        assert "scale_draws_sec" not in compact

    def test_tolerates_missing_optional_keys(self):
        # a degraded run (e.g. probes skipped) must still print
        partial = {"metric": "headline_total_sec", "value": 1.0, "unit": "sec"}
        compact = bench._compact_headline(partial)
        assert compact == partial


class TestPinSets:
    def test_real_affinity_disjoint(self):
        sets = bench._pin_sets()
        allowed = sorted(os.sched_getaffinity(0))
        if len(allowed) < 10:
            assert sets is None
        else:
            set8, set2 = sets
            assert len(set8) == 8 and len(set2) == 2
            assert not (set(set8) & set(set2))
            assert set(set8) <= set(allowed) and set(set2) <= set(allowed)

    def test_small_host_falls_back(self, monkeypatch):
        monkeypatch.setattr(os, "sched_getaffinity", lambda pid: set(range(8)))
        assert bench._pin_sets() is None

    def test_derives_from_mask_not_hardcoded_ids(self, monkeypatch):
        # a host whose mask is 0-11 has no cpu 24 — the r4 hard-coded
        # ids would have crashed here (ADVICE r4)
        monkeypatch.setattr(os, "sched_getaffinity", lambda pid: set(range(12)))
        set8, set2 = bench._pin_sets()
        assert set8 == list(range(4, 12))
        assert set2 == [2, 3]


def test_summarize_pairs_disqualifies_superlinear():
    """eff > 1.0 is impossible for identical work at 4x cores; such
    pairs must drop from BOTH estimators but stay visible."""
    pairs = [
        {"t2_wall": 191.7, "t8_walls": [53.5], "efficiency": 0.872},
        {"t2_wall": 381.3, "t8_walls": [54.8], "efficiency": 1.738},
        {"t2_wall": 194.9, "t8_walls": [55.2], "efficiency": 0.879},
        {"t2_wall": 178.9, "t8_walls": [52.2], "efficiency": 0.849},
    ]
    best, med, n_disq = bench.summarize_pairs(pairs)
    assert n_disq == 1
    assert best == 0.879
    assert med == 0.872
    assert pairs[1]["disqualified"] and not pairs[0]["disqualified"]


def test_summarize_pairs_all_disqualified_reports_raw():
    pairs = [
        {"t2_wall": 1.0, "t8_walls": [0.1], "efficiency": 1.4},
        {"t2_wall": 1.0, "t8_walls": [0.1], "efficiency": 1.2},
    ]
    best, med, n_disq = bench.summarize_pairs(pairs)
    assert n_disq == 2
    assert best == 1.4 and abs(med - 1.3) < 1e-9  # honest failure, not silent repair


def test_summarize_pairs_clean_run_untouched():
    pairs = [{"t2_wall": 200.0, "t8_walls": [55.0], "efficiency": e} for e in (0.81, 0.9, 0.95)]
    best, med, n_disq = bench.summarize_pairs(pairs)
    assert (best, med, n_disq) == (0.95, 0.9, 0)
