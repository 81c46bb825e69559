"""spark-submit entry point: ``spark-submit --py-files sparrow_ipc_spark.zip
-m`` is not supported by spark-submit, so ship this file as the driver
script (or run ``python -m sparrow_ipc_spark ...`` locally):

    spark-submit --py-files sparrow_ipc_spark.zip \
        sparrow_ipc_spark/__main__.py encode --input /data/transcripts \
        --out /data/enc --parts 256

Subcommands mirror the operator suite: encode (with --resume / --append),
decode (with zone-map pruning flags), verify (bit-identity report),
compact (merge undersized blocks), and ipc-export (genuine Arrow IPC
stream files).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from sparrow_ipc_spark.session import get_spark

    return get_spark(app_name=f"sparrow-ipc-{args.cmd}", master=args.master)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sparrow_ipc_spark")
    p.add_argument("--master", default=None, help="Spark master (default: local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="encode a parquet table into blocks+dictionaries+manifest")
    pe.add_argument("--input", required=True, help="input parquet path")
    pe.add_argument("--out", required=True, help="output directory")
    pe.add_argument("--parts", type=int, default=None)
    pe.add_argument("--resume", action="store_true", help="crash-resume: skip committed part ids")
    pe.add_argument("--append", action="store_true", help="append new rows as fresh part ids + delta dictionaries")
    pe.add_argument("--clustered", action="store_true", help="input already clustered by (conv_id, turn_idx): shuffle-free")
    pe.add_argument("--dict-cols", default="role,tool")

    pd_ = sub.add_parser("decode", help="decode blocks back to parquet")
    pd_.add_argument("--input", required=True, help="encoded directory")
    pd_.add_argument("--out", required=True, help="output parquet path")
    pd_.add_argument("--columns", default=None, help="comma-separated column pruning")
    pd_.add_argument("--conv-id", default=None, help="zone-map prune to one conversation")

    pv = sub.add_parser("verify", help="bit-identity report: source parquet vs encoded dir")
    pv.add_argument("--source", required=True)
    pv.add_argument("--encoded", required=True)

    pc = sub.add_parser("compact", help="merge undersized blocks (dictionaries preserved)")
    pc.add_argument("--dir", required=True)
    pc.add_argument("--small-rows", type=int, default=8192)
    pc.add_argument("--target-rows", type=int, default=65536)

    px = sub.add_parser("ipc-export", help="export a parquet table as Arrow IPC stream files")
    px.add_argument("--input", required=True)
    px.add_argument("--out", required=True)
    px.add_argument("--compression", default="zstd", choices=["zstd", "lz4", "none"])

    ps = sub.add_parser("stats", help="per-column codec mix + compression and snapshot summary")
    ps.add_argument("--dir", required=True, help="encoded directory")

    args = p.parse_args(argv)
    spark = _spark(args)

    if args.cmd == "encode":
        from sparrow_ipc_spark.operators.encode_job import write_encoded

        df = spark.read.parquet(args.input)
        stats = write_encoded(
            spark, df, args.out, n_parts=args.parts,
            dict_cols=tuple(c for c in args.dict_cols.split(",") if c),
            resume=args.resume, append=args.append, clustered=args.clustered,
        )
        print(json.dumps(stats))
    elif args.cmd == "decode":
        from sparrow_ipc_spark.operators.decode_job import decode_dir

        cols = args.columns.split(",") if args.columns else None
        decode_dir(spark, args.input, columns=cols, conv_id=args.conv_id) \
            .write.mode("overwrite").parquet(args.out)
        print(json.dumps({"decoded_to": args.out}))
    elif args.cmd == "verify":
        from sparrow_ipc_spark.operators.decode_job import decode_dir
        from sparrow_ipc_spark.operators.verify import roundtrip_report

        rep = roundtrip_report(spark.read.parquet(args.source), decode_dir(spark, args.encoded))
        print(json.dumps(rep))
        # text_mismatches is None when the keyed text check was skipped
        # (generic schema) — that's not a failure; every column was still
        # bit-compared by all_columns_identical
        return 0 if rep["all_columns_identical"] and rep["text_mismatches"] in (0, None) else 1
    elif args.cmd == "compact":
        from sparrow_ipc_spark.operators.compact import compact_blocks

        print(json.dumps(compact_blocks(spark, args.dir, small_rows=args.small_rows,
                                        target_rows=args.target_rows)))
    elif args.cmd == "ipc-export":
        from sparrow_ipc_spark.sources.arrow_ipc import write_ipc_stream

        comp = None if args.compression == "none" else args.compression
        report = write_ipc_stream(spark.read.parquet(args.input), args.out, compression=comp)
        print(json.dumps({"files": len(report), "rows": sum(r["rows"] for r in report),
                          "bytes": sum(r["bytes"] for r in report)}))
    elif args.cmd == "stats":
        from pyspark.sql import functions as F

        from sparrow_ipc_spark.operators.decode_job import snapshots

        blocks = spark.read.parquet(f"{args.dir}/blocks").drop("body")
        per_col = (
            blocks.select(F.explode("columns").alias("c"))
            .groupBy(F.col("c.name").alias("col"), F.col("c.codec").alias("codec"))
            .agg(F.count("*").alias("n_blocks"))
            .orderBy("col", "codec")
        )
        totals = blocks.agg(
            F.count("*").alias("blocks"), F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw_bytes"), F.sum("enc_bytes").alias("enc_bytes"),
        ).collect()[0]
        snaps = [r.asDict() for r in snapshots(spark, args.dir)
                 .select("snapshot", "n_parts", "n_rows", "enc_bytes").collect()]
        # SUM over zero rows is NULL (an empty committed table is legal)
        print(json.dumps({
            "blocks": int(totals["blocks"]), "rows": int(totals["rows"] or 0),
            "raw_bytes": int(totals["raw_bytes"] or 0),
            "enc_bytes": int(totals["enc_bytes"] or 0),
            "ratio": round((totals["raw_bytes"] or 0) / max(1, totals["enc_bytes"] or 0), 3),
            "codecs": [r.asDict() for r in per_col.collect()],
            "snapshots": snaps,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
