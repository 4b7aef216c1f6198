"""CLI surface tests (X1-X3): report files land on disk, counts print."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from tests.log_fixtures import MONGO_LOG, MYSQL_LOG

REPO = Path(__file__).resolve().parent.parent


def run_cli(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "sressentials_spark.cli", *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=900,  # generous: shares the box with the suite's own JVM
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "SPARK_GRAFT_CPUS": "2",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "SPARK_DRIVER_MEMORY": "2g"},
    )


def test_mongo_cli_end_to_end(tmp_path):
    log = tmp_path / "mongod.log"
    log.write_text(MONGO_LOG)
    out = tmp_path / "report.xlsx"
    proc = run_cli("mongo", "-i", str(log), "-o", str(out))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Query Stats" in proc.stdout
    assert "Report saved" in proc.stdout
    # no Excel engine in this env → CSV fallback directory
    sheets = tmp_path / "report.xlsx.sheets"
    assert sheets.is_dir()
    assert (sheets / "Detailed_Metrics.csv").exists()
    assert (sheets / "Error_Stats.csv").exists()
    # parse diagnostics surface on stderr like the reference CLI
    assert "Invalid JSON. Skipped." in proc.stderr


def test_mysql_cli_with_parquet_mirror(tmp_path):
    log = tmp_path / "slow.log"
    log.write_text(MYSQL_LOG)
    out = tmp_path / "report.xlsx"
    mirror = tmp_path / "mirror"
    proc = run_cli("mysql", "-i", str(log), "-o", str(out), "--parquet-mirror", str(mirror))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (tmp_path / "report.xlsx.sheets" / "Aggregate_Results.csv").exists()
    assert (mirror / "detailed").is_dir()


def test_missing_args_is_a_clean_error():
    proc = run_cli("mongo")
    assert proc.returncode == 2
    assert "required" in proc.stderr


def test_max_errors_unbounded(tmp_path):
    """``--max-errors -1`` prints EVERY diagnostic line — parity with
    the reference's unbounded loop (Mongo/mongo_parser.py:226-228)."""
    bad = "\n".join(f"not json {i}" for i in range(25))
    log = tmp_path / "mongod.log"
    log.write_text(MONGO_LOG + "\n" + bad)
    out = tmp_path / "report.xlsx"

    capped = run_cli("mongo", "-i", str(log), "-o", str(out))
    assert capped.returncode == 0, capped.stderr[-2000:]
    assert capped.stderr.count("Invalid JSON. Skipped.") == 10  # default cap

    full = run_cli("mongo", "-i", str(log), "-o", str(out), "--max-errors", "-1")
    assert full.returncode == 0, full.stderr[-2000:]
    assert full.stderr.count("Invalid JSON. Skipped.") == 28  # 3 fixture + 25


def test_save_report_bytes_zip_fallback(tmp_path, spark):
    """The download-button payload builder (reference X4's
    save_to_excel(BytesIO)) must return real bytes in this env's CSV-zip
    fallback, with one member per sheet."""
    import io
    import zipfile

    from sressentials_spark.plans.mongo import analyze_mongo_log
    from sressentials_spark.report import MONGO_SHEETS, save_report_bytes

    log = tmp_path / "mongod.log"
    log.write_text(MONGO_LOG)
    sheets = analyze_mongo_log(spark, str(log), cache=False)
    fmt, fname, payload = save_report_bytes(sheets, MONGO_SHEETS)
    assert fmt in ("xlsx", "zip") and payload
    if fmt == "zip":
        names = set(zipfile.ZipFile(io.BytesIO(payload)).namelist())
        assert names == {"Detailed_Metrics.csv", "Query_Stats.csv",
                         "Non-Slow_Queries.csv", "Error_Stats.csv"}


def test_ui_diagnostics_unbounded_toggle(tmp_path, spark):
    """X4 parity: the web surface's 'show all' mode renders EVERY
    diagnostic (the reference st.warning-loops over all of them,
    Mongo/mongo_parser.py:162-163), while the default view caps at
    _UI_MAX_WARNINGS and appends a suppression note."""
    from sressentials_spark.cli import _UI_MAX_WARNINGS, _render_diagnostics
    from sressentials_spark.plans.mongo import analyze_mongo_log

    n_bad = _UI_MAX_WARNINGS + 13
    bad = "\n".join(f"not json {i}" for i in range(n_bad))
    log = tmp_path / "mongod.log"
    log.write_text(MONGO_LOG + "\n" + bad)
    sheets = analyze_mongo_log(spark, str(log), cache=False)
    total = sheets["parse_errors"].count()
    assert total >= n_bad

    class FakeSt:
        def __init__(self):
            self.warnings = []

        def warning(self, msg):
            self.warnings.append(msg)

    capped = FakeSt()
    shown = _render_diagnostics(capped, sheets["parse_errors"], show_all=False)
    assert shown == _UI_MAX_WARNINGS
    # cap + one suppression note
    assert len(capped.warnings) == _UI_MAX_WARNINGS + 1
    assert "suppressed" in capped.warnings[-1]

    full = FakeSt()
    shown = _render_diagnostics(full, sheets["parse_errors"], show_all=True)
    assert shown == total
    assert len(full.warnings) == total
    assert not any("suppressed" in w for w in full.warnings)
