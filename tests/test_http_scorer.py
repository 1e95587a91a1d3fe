"""HTTP scorer adapter tests (sources/http_scorer.py) against an
in-process HTTP stub — success, 429-retry, non-retryable and persistent
failure paths (reference contract: pipeline/api_client.py:26-65)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from data_engineering_challenge_spark.sources.http_scorer import make_http_scorer


class _StubHandler(BaseHTTPRequestHandler):
    # class-level script: list of status codes to emit, in order; 200
    # responds with linear attribution of the posted journeys
    script: list[int] = []
    requests_seen: list[dict] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests_seen.append(
            {"body": body, "headers": dict(self.headers), "path": self.path}
        )
        status = type(self).script.pop(0) if type(self).script else 200
        if status != 200:
            self.send_response(status)
            self.end_headers()
            return
        journeys = body["customer_journeys"]
        counts: dict = {}
        for r in journeys:
            counts[r["conversion_id"]] = counts.get(r["conversion_id"], 0) + 1
        value = [
            {
                "conversion_id": r["conversion_id"],
                "session_id": r["session_id"],
                "ihc": 1.0 / counts[r["conversion_id"]],
            }
            for r in journeys
        ]
        payload = json.dumps({"statusCode": 200, "value": value}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # silence test output
        pass


@pytest.fixture
def stub_server():
    server = HTTPServer(("127.0.0.1", 0), _StubHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    _StubHandler.script = []
    _StubHandler.requests_seen = []
    yield f"http://127.0.0.1:{server.server_port}/v1/compute_ihc"
    server.shutdown()


JOURNEYS = [
    {"conversion_id": 1, "session_id": 10, "timestamp": "2024-01-01 00:00:00"},
    {"conversion_id": 1, "session_id": 11, "timestamp": "2024-01-01 01:00:00"},
    {"conversion_id": 2, "session_id": 20, "timestamp": "2024-01-02 00:00:00"},
]


def test_success_contract(stub_server):
    score = make_http_scorer(
        stub_server, api_key="k123", conv_type_id="t1", throttle_s=0.0
    )
    out = score(JOURNEYS)
    assert out == [
        {"conversion_id": 1, "session_id": 10, "ihc": 0.5},
        {"conversion_id": 1, "session_id": 11, "ihc": 0.5},
        {"conversion_id": 2, "session_id": 20, "ihc": 1.0},
    ]
    req = _StubHandler.requests_seen[0]
    assert req["body"] == {"customer_journeys": JOURNEYS}
    headers = {k.lower(): v for k, v in req["headers"].items()}
    assert headers["x-api-key"] == "k123"
    assert headers["content-type"] == "application/json"
    assert "conv_type_id=t1" in req["path"]


def test_429_retries_then_succeeds(stub_server):
    _StubHandler.script = [429, 429]
    score = make_http_scorer(stub_server, max_retries=3, backoff_s=0.01)
    out = score(JOURNEYS)
    assert len(out) == 3
    assert len(_StubHandler.requests_seen) == 3  # 2 failures + 1 success


def test_persistent_500_raises(stub_server):
    _StubHandler.script = [500, 500, 500]
    score = make_http_scorer(stub_server, max_retries=2, backoff_s=0.01)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        score(JOURNEYS)


def test_non_retryable_raises_immediately(stub_server):
    _StubHandler.script = [403]
    score = make_http_scorer(stub_server, max_retries=3, backoff_s=0.01)
    with pytest.raises(RuntimeError, match="HTTP 403"):
        score(JOURNEYS)
    assert len(_StubHandler.requests_seen) == 1


def test_requires_url():
    with pytest.raises(ValueError):
        make_http_scorer("")


# ---------------------------------------------------------------------------
# integration: the full attribute_external -> applyInPandas -> HTTP path
# against a real local server, with the REAL pipeline journey schema
# (datetime64 timestamps + conv_ts + the re-read path's conv_date column) —
# exercising the executor pickling path and the JSON wire contract
# ---------------------------------------------------------------------------


def _pipeline_journeys(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rows = []
    t0 = datetime(2024, 1, 5)
    for cid, n in {1: 2, 2: 3}.items():
        conv_ts = t0 + timedelta(hours=cid)
        for i in range(n):
            rows.append(
                Row(
                    conversion_id=cid,
                    session_id=cid * 100 + i,
                    timestamp=conv_ts - timedelta(minutes=30 * i),
                    channel_label="social",
                    holder_engagement=i % 2,
                    closer_engagement=0,
                    conversion=0,
                    impression_interaction=0,
                    conv_ts=conv_ts,
                )
            )
    return spark.createDataFrame(rows).withColumn(
        "conv_date", F.date_format("conv_ts", "yyyy-MM-dd")
    )


def test_attribute_external_http_end_to_end(spark, stub_server):
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators import batching

    score = make_http_scorer(stub_server, api_key="k", backoff_s=0.01)
    out = batching.attribute_external(
        _pipeline_journeys(spark), score_fn=score, num_chunks=2
    )
    sums = {
        r.conversion_id: r.s
        for r in out.groupBy("conversion_id").agg(F.sum("ihc").alias("s")).collect()
    }
    assert sums[1] == pytest.approx(1.0) and sums[2] == pytest.approx(1.0)

    # wire contract: timestamps as strings, engine-internal columns dropped
    assert _StubHandler.requests_seen
    for req in _StubHandler.requests_seen:
        for rec in req["body"]["customer_journeys"]:
            assert isinstance(rec["timestamp"], str)
            assert len(rec["timestamp"]) == 19  # yyyy-MM-dd HH:mm:ss
            for internal in ("conv_ts", "conv_date", "_chunk"):
                assert internal not in rec


def test_attribute_external_http_retry_on_429(spark, stub_server):
    from data_engineering_challenge_spark.operators import batching

    _StubHandler.script = [429]  # first request throttled, retry succeeds
    score = make_http_scorer(stub_server, max_retries=2, backoff_s=0.01)
    out = batching.attribute_external(
        _pipeline_journeys(spark), score_fn=score, num_chunks=1
    )
    assert out.count() == 5
    assert len(_StubHandler.requests_seen) == 2  # 429 + successful retry


def test_pipeline_external_http_full_path(spark, stub_server, tmp_path):
    """THE wiring the reference runs in production: PipelineConfig(api_url)
    -> AttributionPipeline step 1 writes date-partitioned journeys ->
    step 2 RE-READS them (datetime64 timestamp + the conv_date partition
    column) -> attribute_external -> HTTP scorer.  This is the path that
    used to crash on json.dumps(pd.Timestamp); it must score through the
    real server and land unit ihc sums in the written attribution table."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark import roles
    from data_engineering_challenge_spark.config import PipelineConfig
    from data_engineering_challenge_spark.pipeline import AttributionPipeline

    d = tmp_path / "star"
    d.mkdir()
    events = roles.load_events(spark, "/root/testdata/sf0.001")
    roles.conversions_from_events(events).write.parquet(str(d / "conversions.parquet"))
    roles.sessions_from_events(events).write.parquet(
        str(d / "session_sources.parquet")
    )
    roles.session_costs_from_events(events).write.parquet(
        str(d / "session_costs.parquet")
    )

    cfg = PipelineConfig(
        table_dir=str(d),
        journeys_path=str(tmp_path / "journeys.parquet"),
        report_path=str(tmp_path / "report.parquet"),
        csv_exports=False,
        model="external",
        api_url=stub_server,
        api_key="k",
        api_backoff_s=0.01,
    )
    p = AttributionPipeline(spark, cfg)
    p.build_journeys()
    p.attribute(None)  # re-reads the partitioned parquet — the crash path

    assert _StubHandler.requests_seen  # the API was actually hit
    att = spark.read.parquet(str(d / "attribution_customer_journey"))
    sums = att.groupBy("conversion_id").agg(F.sum("ihc").alias("s")).collect()
    assert sums and all(abs(r.s - 1.0) < 1e-6 for r in sums)
