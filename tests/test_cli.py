"""CLI surface tests (C1 parity) — driven via the argparse entry point."""

from __future__ import annotations

import json

from syscol_spark.cli import main


def test_validate_gate_fails_without_topic(capsys):
    rc = main(["validate", "--hosts", "h1"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1
    assert out["can_start"] is False


def test_validate_gate_passes(tmp_path, capsys):
    props = tmp_path / "p.properties"
    props.write_text("bootstrap.servers=b:9092\n")
    rc = main(["validate", "--topic", "t", "--producer-properties", str(props)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["can_start"] is True


def test_validate_avro_requires_registry(tmp_path, capsys):
    props = tmp_path / "p.properties"
    props.write_text("a=b\n")
    rc = main(["validate", "--topic", "t", "--producer-properties", str(props), "--transform", "avro"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and "registry" in out["reason"]


def test_describe_lists_catalog(capsys):
    rc = main(["describe"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["n_queries"] >= 58
    assert "q01_pricing_summary" in out["queries"]


def test_query_verb_runs_catalog_query(spark, sf_dir, capsys):
    rc = main(["query", "q01_pricing_summary", "--sf-dir", sf_dir, "--limit", "2"])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and len(lines) == 2
    assert "l_returnflag" in lines[0] and "sum_qty" in lines[0]


def test_query_verb_unknown_name(capsys):
    rc = main(["query", "no_such_query"])
    assert rc == 1
    assert "unknown query" in json.loads(capsys.readouterr().err)["error"]
