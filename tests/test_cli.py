"""CLI tool tests (reference L7 cmd tools: arrow-cat/arrow-ls/
parquet_reader/parquet_schema/file<->stream/arrow-json-integration-test)."""
import io
import os

import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import cli, dtypes as dt, ipc
from arrow_go_tpu.interop import arrjson


@pytest.fixture
def sample(tmp_path):
    t = agt.table({"x": agt.array([1, None, 3], dt.int64),
                   "s": ["a", None, "c"]})
    p = tmp_path / "t.arrow"
    with open(p, "wb") as f:
        with ipc.new_file(f, t.schema) as w:
            w.write_table(t)
    return t, str(p), tmp_path


def test_cat_ls_schema(sample, capsys):
    t, arrow_path, tmp = sample
    cli.main(["cat", arrow_path])
    out = capsys.readouterr().out
    assert "x" in out and "s" in out
    cli.main(["ls", arrow_path])
    assert "3" in capsys.readouterr().out
    pq_path = str(tmp / "t.parquet")
    cli.main(["convert", arrow_path, pq_path])
    capsys.readouterr()
    cli.main(["schema", pq_path])
    out = capsys.readouterr().out
    assert "x" in out


def test_convert_roundtrip(sample):
    t, arrow_path, tmp = sample
    csv_path = str(tmp / "t.csv")
    cli.main(["convert", arrow_path, csv_path])
    back = agt.formats.read_csv(csv_path)
    assert back.column("x").to_pylist() == [1, None, 3]


def test_json_integration(sample, capsys):
    t, arrow_path, tmp = sample
    jpath = str(tmp / "t.json")
    with open(jpath, "w") as f:
        f.write(arrjson.write_arrjson(t.to_batches()))
    a2 = str(tmp / "t2.arrow")
    cli.main(["json-integration", "--mode", "JSON_TO_ARROW",
              "--json", jpath, "--arrow", a2])
    cli.main(["json-integration", "--mode", "VALIDATE",
              "--json", jpath, "--arrow", a2])
    assert "validation passed" in capsys.readouterr().out
    j2 = str(tmp / "t2.json")
    cli.main(["json-integration", "--mode", "ARROW_TO_JSON",
              "--json", j2, "--arrow", a2])
    assert arrjson.read_arrjson(open(j2).read())[0].num_rows == 3


def test_json_integration_validate_mismatch(sample, tmp_path):
    t, arrow_path, tmp = sample
    bad = agt.table({"x": agt.array([9, 9, 9], dt.int64),
                     "s": ["a", None, "c"]})
    jpath = str(tmp / "bad.json")
    with open(jpath, "w") as f:
        f.write(arrjson.write_arrjson(bad.to_batches()))
    with pytest.raises(SystemExit):
        cli.main(["json-integration", "--mode", "VALIDATE",
                  "--json", jpath, "--arrow", arrow_path])
