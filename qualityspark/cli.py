"""spark-submit entry point.

Packaging (BASELINE.json north_rule: "packaged for spark-submit
--py-files"):

    cd /root/repo && zip -r /tmp/qualityspark.zip qualityspark
    spark-submit --py-files /tmp/qualityspark.zip -m qualityspark.cli ...

or locally:  python -m qualityspark.cli <command> [args]

Commands:
  run     --input DIR --output DIR [--chunks N]    resumable audit run
  synth   --output DIR --rows N [--partitions P]   generate a pages corpus
  drift   --prev DIR --cur DIR                     compare two run metrics
  stream  --input DIR --output DIR --checkpoint D  availableNow drain
  bench                                            delegate to bench.py
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="qualityspark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run")
    r.add_argument("--input", required=True)
    r.add_argument("--output", required=True)
    r.add_argument("--chunks", type=int, default=16)
    r.add_argument("--config", default=None,
                   help="YAML/JSON runtime config: thresholds, "
                        "disabled_rules, severity_overrides, scoring, "
                        "column_weights, business_rules")
    r.add_argument("--run-id", default="run0")
    r.add_argument("--history", default=None,
                   help="run-history dir: appends this run's metrics row "
                        "and reports the multi-run quality trend")
    r.add_argument("--schema", default=None,
                   help="YAML/JSON schema contract; violations are "
                        "reported and raise the exit code")

    ac = sub.add_parser("audit-csv")
    ac.add_argument("--input", required=True)
    ac.add_argument("--date-col", default=None,
                    help="date column for the temporal analysis family "
                         "(reference --date-col)")
    ac.add_argument("--quiet", action="store_true",
                    help="suppress stdout report; exit code only "
                         "(reference --quiet)")
    ac.add_argument("--text-report", default=None,
                    help="path for a plain-text report "
                         "(reference --text-report)")
    ac.add_argument("--no-auto-output", action="store_true",
                    help="do not create the automatic outputs/ run "
                         "directory when --output is omitted "
                         "(reference --no-auto-output)")
    ac.add_argument("--output", default=None,
                    help="dir for report.json (default: print to stdout)")
    ac.add_argument("--config", default=None)
    ac.add_argument("--schema", default=None,
                    help="YAML/JSON schema contract (reference --schema): "
                         "SCHEMA_* checks join the report and exit code")

    ap = sub.add_parser("audit-parquet")
    ap.add_argument("--input", required=True,
                    help="parquet file or directory (one table; a "
                         "directory of part files reads as one frame)")
    ap.add_argument("--date-col", default=None)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--text-report", default=None)
    ap.add_argument("--no-auto-output", action="store_true")
    ap.add_argument("--output", default=None,
                    help="dir for report.json (default: print to stdout)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--schema", default=None)

    s = sub.add_parser("synth")
    s.add_argument("--output", required=True)
    s.add_argument("--rows", type=int, default=100_000)
    s.add_argument("--partitions", type=int, default=64)
    s.add_argument("--seed", type=int, default=42)

    cc = sub.add_parser("compare-csv")
    cc.add_argument("--reference", required=True)
    cc.add_argument("--current", required=True)
    cc.add_argument("--config", default=None)

    rp = sub.add_parser("report")
    rp.add_argument("--audited", required=True,
                    help="audited table dir (run output data/ dir)")
    rp.add_argument("--output", required=True)
    rp.add_argument("--run-id", default="run0")
    rp.add_argument("--config", default=None)

    d = sub.add_parser("drift")
    d.add_argument("--prev", required=True)
    d.add_argument("--cur", required=True)

    st = sub.add_parser("stream")
    st.add_argument("--input", required=True)
    st.add_argument("--output", required=True)
    st.add_argument("--checkpoint", required=True)

    args = p.parse_args(argv)

    # load + validate config BEFORE paying for a SparkSession, so a bad
    # file fails in milliseconds (reference ConfigLoader.load behavior)
    cfg = None
    if getattr(args, "config", None):
        from qualityspark.config import load_config
        cfg = load_config(args.config)
    # same fail-fast rule for the schema contract: a malformed file must
    # die in milliseconds, not after session startup
    contract = None
    if getattr(args, "schema", None):
        from qualityspark.schema_contract import load_contract
        contract = load_contract(args.schema)

    from qualityspark.session import get_spark
    spark = get_spark(app=f"qualityspark-{args.cmd}")

    if args.cmd == "run":
        from qualityspark.io import run_resumable
        pages = spark.read.parquet(args.input)
        schema_results = None
        if contract:
            # parquet input has real physical types -> StructType-level
            # contract validation, reference-severity labels attached
            from qualityspark.schema_contract import (SCHEMA_SEVERITY,
                                                      validate_schema)
            schema_results = [
                {**r, "severity": SCHEMA_SEVERITY.get(r["check_id"],
                                                      "HIGH")}
                for r in validate_schema(pages, contract)]
        info = run_resumable(spark, pages, args.output, chunks=args.chunks,
                             cfg=cfg, run_id=args.run_id,
                             history_dir=args.history)
        if schema_results is not None:
            info["schema_checks"] = schema_results
            failed = [r for r in schema_results if not r["passed"]]
            info["schema_exit_code"] = (
                2 if any(r["severity"] == "CRITICAL" for r in failed)
                else 1 if failed else 0)
        print(json.dumps(info))
        if schema_results is not None:
            spark.stop()
            sys.exit(info["schema_exit_code"])
    elif args.cmd in ("audit-csv", "audit-parquet"):
        import os
        from qualityspark.reports import csv_to_text
        if args.cmd == "audit-parquet":
            from qualityspark.table_audit import audit_parquet
            report = audit_parquet(spark, args.input, cfg=cfg,
                                   schema=contract,
                                   date_col=args.date_col)
        elif os.path.isdir(args.input):   # reference --batch dir/ path
            from qualityspark.csv_audit import (audit_csv_batch,
                                                batch_exit_code)
            report = audit_csv_batch(spark, args.input, cfg=cfg,
                                     schema=contract)
            report["exit_code"] = batch_exit_code(report)
        else:
            from qualityspark.csv_audit import audit_csv
            report = audit_csv(spark, args.input, cfg=cfg,
                               schema=contract, date_col=args.date_col)
        run_prefix = (args.cmd.replace("-", "_")) + "_run_"
        out_dir = args.output
        if out_dir is None and not args.no_auto_output:
            # reference default: auto run directory under outputs/
            # (data_quality_auditor.py run_dir); numbered for determinism
            base = "outputs"
            os.makedirs(base, exist_ok=True)
            n = 1 + max((int(d.rsplit("_", 1)[1])
                         for d in os.listdir(base)
                         if d.startswith(run_prefix)
                         and d.rsplit("_", 1)[1].isdigit()), default=0)
            out_dir = os.path.join(base, f"{run_prefix}{n}")
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "report.json"), "w") as f:
                json.dump(report, f, indent=2)
            txt_path = args.text_report or os.path.join(out_dir,
                                                        "report.txt")
        else:
            txt_path = args.text_report
        if txt_path and "columns" in report:   # batch has no text form
            with open(txt_path, "w") as f:
                f.write(csv_to_text(report))
        if not args.quiet:
            if out_dir:
                print(json.dumps({
                    "output": out_dir,
                    "dataset_score": report.get(
                        "dataset_score",
                        (report.get("summary") or {}).get("avg_score")),
                    "grade": report.get("grade"),
                    "exit_code": report["exit_code"]}))
            else:
                print(json.dumps(report, indent=2))
        spark.stop()
        sys.exit(report["exit_code"])
    elif args.cmd == "synth":
        from qualityspark import synth
        (synth.pages_df(spark, args.rows, seed=args.seed,
                        partitions=args.partitions)
         .write.mode("overwrite").parquet(args.output))
        print(json.dumps({"output": args.output, "rows": args.rows}))
    elif args.cmd == "compare-csv":
        from qualityspark.csv_audit import compare_csv
        print(json.dumps(compare_csv(spark, args.reference, args.current,
                                     cfg=cfg), indent=2))
    elif args.cmd == "report":
        from qualityspark.reports import write_reports
        audited = spark.read.parquet(args.audited)
        out = write_reports(spark, audited, args.output,
                            run_id=args.run_id, cfg=cfg)
        print(json.dumps({"paths": out["paths"],
                          "grade": out["report"]["grade"],
                          "n_docs": out["report"]["n_docs"]}))
    elif args.cmd == "drift":
        from qualityspark.drift import compare_metrics_tables
        prev = spark.read.parquet(f"{args.prev}/metrics")
        cur = spark.read.parquet(f"{args.cur}/metrics")
        print(json.dumps(compare_metrics_tables(prev, cur)))
    elif args.cmd == "stream":
        from qualityspark.streaming import (stream_pages, stream_audit,
                                            run_available_now)
        run_available_now(stream_audit(stream_pages(spark, args.input)),
                          args.output, args.checkpoint)
        print(json.dumps({"output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
