#!/usr/bin/env python
"""CLI entry point — step surface parity with the reference
(reference run_pipeline.py:31-106): --config / --step / --start-date /
--end-date / --journeys-path / --report-path, plus Spark-native extras
(--model, --table-dir).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys

from data_engineering_challenge_spark.config import PipelineConfig
from data_engineering_challenge_spark.pipeline import AttributionPipeline
from data_engineering_challenge_spark.session import get_spark


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run the Spark attribution pipeline")
    p.add_argument("--config", default=None, help="Path to INI config")
    p.add_argument(
        "--step",
        choices=["build-journeys", "send-to-api", "generate-report", "all", "dag"],
        default="all",
    )
    p.add_argument(
        "--ready-flag",
        default=None,
        help="dag step: path of the data-ready flag to wait for "
        "(FileSensor twin; omit to skip the sensor)",
    )
    p.add_argument(
        "--poke-interval",
        type=float,
        default=300.0,
        help="dag step: seconds between ready-flag polls",
    )
    p.add_argument("--start-date", help="YYYY-MM-DD inclusive")
    p.add_argument("--end-date", help="YYYY-MM-DD inclusive")
    p.add_argument("--journeys-path", default=None)
    p.add_argument("--report-path", default=None)
    p.add_argument("--table-dir", default=None, help="Directory of input parquet tables")
    p.add_argument(
        "--model",
        choices=["last_touch", "first_touch", "linear", "position_engagement", "external"],
        default=None,
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    args = parse_args(argv)
    cfg = PipelineConfig.from_ini(args.config) if args.config else PipelineConfig()
    overrides = {
        k: v
        for k, v in {
            "journeys_path": args.journeys_path,
            "report_path": args.report_path,
            "table_dir": args.table_dir,
            "model": args.model,
        }.items()
        if v is not None
    }
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    spark = get_spark(app_name="attribution-pipeline")
    pipe = AttributionPipeline(spark, cfg)

    if args.step == "build-journeys":
        df = pipe.build_journeys(args.start_date, args.end_date)
        print(f"journeys rows: {df.count()}")
    elif args.step == "send-to-api":
        df = pipe.attribute()
        print(f"attributed rows: {df.count()}")
    elif args.step == "generate-report":
        df = pipe.report(args.start_date, args.end_date)
        print(f"report rows: {df.count()}")
    elif args.step == "dag":
        from data_engineering_challenge_spark.orchestration import (
            attribution_pipeline_graph,
        )

        g = attribution_pipeline_graph(
            spark,
            cfg,
            args.start_date,
            args.end_date,
            ready_flag=args.ready_flag,
            poke_interval_s=args.poke_interval,
        )
        try:
            report = g.run()
        except Exception as exc:
            for name, row in getattr(exc, "step_report", {}).items():
                print(f"{name}: {row['status']} ({row['seconds']:.1f}s)")
            raise
        for name, row in report.items():
            print(f"{name}: {row['status']} ({row['seconds']:.1f}s)")
    else:
        df = pipe.run(args.start_date, args.end_date)
        print(f"report rows: {df.count() if df is not None else 0}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
