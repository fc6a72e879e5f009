"""Sweep-CLI smoke coverage (zvdb_tpu/bench/sweep.py).

The sweep mirrors the reference's benchmark drivers (SURVEY.md §3.4,
reference benchmarks/single_threaded_benchmarks.zig:28-33) and is one of the
two public CLI surfaces; every engine choice must build, search, report a
parseable JSON object on stdout, and honor --recall / --out. Tiny shapes —
this pins the wiring, not performance.
"""
import json

import pytest

from zvdb_tpu.bench import sweep


def _run(capsys, argv):
    sweep.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["operation"] == "search"
    return rec


BASE = ["--points", "600", "--queries", "60", "--dims", "16", "--ks", "5",
        "--recall"]


@pytest.mark.parametrize("engine", ["hnsw", "flat", "ivf", "cagra", "pq"])
def test_every_engine_reports_json(capsys, engine):
    rec = _run(capsys, BASE + ["--engine", engine])
    assert rec["num_points"] == 600 and rec["k"] == 5
    # tiny clustered-free random data: every engine should still be far
    # above chance; the exact engines should be near-perfect
    floor = 0.9 if engine in ("flat", "hnsw", "cagra") else 0.5
    assert rec["recall"] >= floor, (engine, rec)


def test_pq_opq_and_nsub(capsys):
    rec = _run(capsys, BASE + ["--engine", "pq", "--pq-nsub", "8", "--opq"])
    assert rec["recall"] >= 0.5


def test_out_file_collects_all_rows(capsys, tmp_path):
    out = tmp_path / "rows.jsonl"
    _run(capsys, BASE + ["--engine", "flat", "--ks", "3,5",
                         "--out", str(out)])
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    # one insertion row + one search row per k
    assert [r["operation"] for r in rows] == ["insertion", "search", "search"]
    assert {r.get("k") for r in rows if r["operation"] == "search"} == {3, 5}
