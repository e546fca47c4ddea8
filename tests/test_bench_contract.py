"""The driver parse contract for bench.py's LAST stdout line.

BENCH_r03.json and BENCH_r04.json both recorded "parsed": null because
the final line embedded the full per-row map and overflowed the
driver's tail capture. These tests pin the fix: the compact line stays
well under 1 KB no matter how many rows the suite grows, parses as
JSON, and carries every scalar the record needs; the full map lives in
BENCH/last_run_stats.json only.
"""

import json

import bench


def _fake_run(n_rows=200):
    timings = {f"query_with_a_long_name_{i:04d}": 123.456 for i in range(n_rows)}
    for q in bench.R01_SUBSET:
        timings[q] = 9.999
    extras = {
        "edges_per_sec_superstep": 6800662.0,
        "decay_chunks": 4,
        "max_rounds": 19.3,
        "mean_rounds": 19.2,
        "superstep_edges": 50432000,
        "edges_per_sec_driver_dist": 1608152.5,
        "driver_dist_score_rows": 993280,
        "edges_per_sec_tpr_dist": 5545977.0,
        "tpr_score_rows": 248320,
        "edges_per_sec_did_dist": 2686187.2,
        "did_dist_score_rows": 993280,
    }
    probe = {"burn_mops": 90.2, "stream_iters": 261.75}
    return bench.compact_line(
        timings, {}, extras, 0.1, 32, probe, probe
    )


def test_compact_line_is_small_and_parses():
    line = json.dumps(_fake_run())
    assert len(line.encode()) < 1024, len(line.encode())
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == 200 + len(bench.R01_SUBSET)
    # only the 9 r01-subset rows ride along; the rest live in the file
    assert set(parsed["queries"]) == set(bench.R01_SUBSET)
    assert parsed["edges_per_sec_superstep"] == 6800662.0
    assert parsed["stats_file"] == "BENCH/last_run_stats.json"


def test_compact_line_size_is_row_count_invariant():
    small = len(json.dumps(_fake_run(1)).encode())
    big = len(json.dumps(_fake_run(5000)).encode())
    assert big - small < 8  # only the n_queries digits may grow


def test_probe_healthy_floors():
    assert bench.probe_healthy(None)  # probes disabled: never gate
    assert bench.probe_healthy({"burn_mops": 150.0, "stream_iters": 8.0})
    assert bench.probe_healthy({"burn_mops": 90.0, "stream_iters": 60.0})
    assert not bench.probe_healthy({"burn_mops": 90.0, "stream_iters": 8.9})
