"""CLI driver surface: encode → verify → decode → compact via main()."""

from __future__ import annotations

import json

from sparrow_ipc_spark.__main__ import main
from sparrow_ipc_spark.sources.transcripts import transcripts_df


def test_cli_encode_verify_decode(spark, tmp_path_factory, capsys):
    base = str(tmp_path_factory.mktemp("cli"))
    transcripts_df(spark, n_convs=30, seed=42).write.mode("overwrite").parquet(f"{base}/src")

    assert main(["encode", "--input", f"{base}/src", "--out", f"{base}/enc",
                 "--parts", "4"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] > 0 and stats["enc_bytes"] < stats["raw_bytes"]

    assert main(["verify", "--source", f"{base}/src", "--encoded", f"{base}/enc"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["all_columns_identical"] is True

    assert main(["decode", "--input", f"{base}/enc", "--out", f"{base}/dec",
                 "--columns", "conv_id,text"]) == 0
    dec = spark.read.parquet(f"{base}/dec")
    assert dec.columns == ["conv_id", "text"] and dec.count() == stats["rows"]

    assert main(["stats", "--dir", f"{base}/enc"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["rows"] == stats["rows"] and st["ratio"] > 1
    assert {c["col"] for c in st["codecs"]} == {"conv_id", "turn_idx", "role",
                                               "text", "tool", "ts"}
    assert st["snapshots"][0]["snapshot"] == 0
