"""CLI: load / search / merge round-trips (in-process, module main)."""

import json

import pytest

from bloomsearch_tpu import cli


def test_load_search_merge_roundtrip(tmp_path, capsys):
    jsonl = tmp_path / "logs.jsonl"
    with open(jsonl, "w") as fh:
        for i in range(50):
            fh.write(json.dumps({"n": i, "svc": "auth", "msg": f"tok{i} common"}) + "\n")
        fh.write("\n")  # blank lines skipped
        fh.write(json.dumps({"n": 50, "svc": "pay", "msg": "connection 9 timeout"}) + "\n")

    data_dir = str(tmp_path / "data")
    cli.main(["load", "--dir", data_dir, "--probe-backend", "host", str(jsonl)])
    out = capsys.readouterr().out
    assert "loaded 51 rows" in out

    cli.main([
        "search", "--dir", data_dir, "--probe-backend", "host",
        "--token", "tok7",
    ])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert rows == [{"n": 7, "svc": "auth", "msg": "tok7 common"}]

    cli.main([
        "search", "--dir", data_dir, "--probe-backend", "host",
        "--field-token", "svc:pay", "--regex", r"msg=connection \d+ timeout",
    ])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert len(rows) == 1 and rows[0]["n"] == 50

    cli.main([
        "search", "--dir", data_dir, "--probe-backend", "host",
        "--token", "common", "--limit", "5",
    ])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert len(rows) == 5

    cli.main(["merge", "--dir", data_dir, "--probe-backend", "host"])
    assert "merged" in capsys.readouterr().out


def test_object_dir_backend(tmp_path, capsys):
    jsonl = tmp_path / "x.jsonl"
    jsonl.write_text(json.dumps({"m": "needle row"}) + "\n")
    bucket = str(tmp_path / "bucket")
    cli.main(["load", "--object-dir", bucket, "--probe-backend", "host", str(jsonl)])
    capsys.readouterr()  # drain the load summary
    cli.main(["search", "--object-dir", bucket, "--probe-backend", "host", "--token", "needle"])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert rows == [{"m": "needle row"}]


def test_bad_specs_rejected(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["search", "--dir", str(tmp_path), "--field-token", "nocolon"])
    with pytest.raises(SystemExit):
        cli.main(["search", "--dir", str(tmp_path), "--regex", "noequals"])
