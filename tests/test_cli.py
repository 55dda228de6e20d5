"""CLI tests via Click's runner — the reference's own CLI test pattern
(tests/test_dbsink.py:15-21, integration tier :442-826)."""

import duckdb
from click.testing import CliRunner

from conftest import fixture_path

from dbsink_spark.cli import setup


def test_cli_help():
    result = CliRunner().invoke(setup, ["--help"])
    assert result.exit_code == 0
    assert "--datafile" in result.output


def test_cli_datafile_replay(tmp_path):
    db = tmp_path / "cli.duckdb"
    result = CliRunner().invoke(
        setup,
        [
            "--topic", "axds-netcdf-replayer-data",
            "--lookup", "GenericFloat",
            "--db", f"duckdb:///{db}",
            "--datafile", fixture_path("replayer.json"),
            "--drop",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    con = duckdb.connect(str(db))
    n = con.execute('SELECT count(*) FROM "axds-netcdf-replayer-data"').fetchone()[0]
    con.close()
    assert n == 4


def test_cli_dry_run(tmp_path):
    db = tmp_path / "dry.duckdb"
    result = CliRunner().invoke(
        setup,
        [
            "--topic", "t",
            "--lookup", "GenericFloat",
            "--db", f"duckdb:///{db}",
            "--datafile", fixture_path("replayer.json"),
            "--no-do-inserts",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0


def test_cli_date_filter(tmp_path):
    db = tmp_path / "filt.duckdb"
    result = CliRunner().invoke(
        setup,
        [
            "--topic", "numurus",
            "--lookup", "NumurusData",
            "--db", f"duckdb:///{db}",
            "--datafile", fixture_path("numurus.data.json"),
            "--drop",
            "--start_date", "2019-07-18 15:00:00",
            "--end_date", "2019-07-18 16:00:00",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    con = duckdb.connect(str(db))
    n = con.execute('SELECT count(*) FROM "numurus"').fetchone()[0]
    con.close()
    # the 2 in-window messages share identical upsert keys → the
    # last-writer-wins dedup collapses them to one upserted row
    assert n == 1
