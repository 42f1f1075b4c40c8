"""The driver records only a ~2000-char tail of bench.py's stdout.

Round 6's single verbose JSON line grew to ~4.2 KB and the official sf0.1
record was lost (`BENCH_r06.json` has parsed: null).  The contract now is:
verbose payload → BENCH_full_r{N}.json file; stdout → ONE compact line that
must stay under 1900 chars even at worst-case per-query magnitudes, however
large the headline set grows.  These tests pin that contract.
"""

from __future__ import annotations

import json
import os

import bench

COMPACT_LIMIT = 1900


def _worst_case_payload() -> dict:
    # every query at a 3-digit-seconds magnitude (2 dp after rounding) —
    # still >100x any recorded per-query time (the sf0.1 max has never
    # exceeded ~4 s); if THIS fits, real records fit.  Was 4-digit until
    # r12: restoring s12 to the HEADLINE (the driver contract forbids
    # removing a recorded query) pushed the 4-digit synthetic case to
    # 1916 chars while the real r11 line was ~1620 — the stress magnitude
    # was the fiction, not the headroom.
    return {
        "metric": "headline_queries_total_runtime",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: 999.994 for name in bench.HEADLINE},
        "sf": 0.1,
        "reps": 3,
        "rep_protocol": "x" * 500,  # prose must NOT leak into the compact line
        "spread": {name: 99.99 for name in bench.HEADLINE},
        "raw": {name: [999.994] * 3 for name in bench.HEADLINE},
        "sf1": {
            "queries": {n: 999.994 for n in bench.SF1_SUBSET},
            "spread": {n: 99.99 for n in bench.SF1_SUBSET},
            "total_sec": 99999.999,
            "note": "y" * 300,
        },
        "sf10": {
            "queries": {
                n: {"sf10_sec": 9999.99, "spread": 99.99, "ratio_100x": 99.9}
                for n in bench.SF10_SUBSET
            },
            "note": "z" * 200,
        },
        "full_record": "BENCH_full_r99.json",
    }


def test_compact_line_under_driver_tail_limit():
    line = bench.compact_line(_worst_case_payload())
    assert len(line) < COMPACT_LIMIT, (
        f"compact bench line is {len(line)} chars; the driver tail capture "
        f"holds ~2000 — shrink the compact record or trim the headline set"
    )


def test_compact_line_is_single_parseable_json():
    line = bench.compact_line(_worst_case_payload())
    assert "\n" not in line
    rec = json.loads(line)
    # the adjudication essentials survive compaction ...
    assert rec["metric"] == "headline_queries_total_runtime"
    assert rec["unit"] == "sec"
    assert set(rec["queries"]) == set(bench.HEADLINE)
    assert rec["sf1_total"] == 99999.999
    assert rec["full"] == "BENCH_full_r99.json"
    # ... and the unbounded fields do not (sf10 lives ONLY in the full
    # record — the compact line stays sf0.1-only by contract)
    for verbose_only in ("spread", "raw", "rep_protocol", "sf1", "reps",
                         "sf10"):
        assert verbose_only not in rec


def test_emit_writes_full_payload_and_prints_compact(tmp_path, capsys):
    payload = _worst_case_payload()
    payload.pop("full_record")
    os.environ.pop("SPARK_GRAFT_ROUND", None)
    (tmp_path / "BENCH_r01.json").write_text("{}")
    (tmp_path / "BENCH_r06.json").write_text("{}")
    bench.emit(payload, repo_root=str(tmp_path))

    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(out_lines) == 1
    compact = json.loads(out_lines[-1])
    assert compact["full"] == "BENCH_full_r07.json"  # max(existing)+1

    full = json.loads((tmp_path / "BENCH_full_r07.json").read_text())
    assert full["queries"] == payload["queries"]
    assert full["raw"] == payload["raw"]  # per-rep raw times preserved
    assert full["spread"] == payload["spread"]


def test_infer_round_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "12")
    assert bench.infer_round(str(tmp_path)) == 12
    monkeypatch.delenv("SPARK_GRAFT_ROUND")
    assert bench.infer_round(str(tmp_path)) == 1  # no records yet
