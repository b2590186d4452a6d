"""S8/S11 transport parity — a WIRE-LEVEL OTLP ingest test.

The reference's metric feed arrives over OTLP gRPC
(otel-collector/config/otel-config.yaml:26-58).  This sandbox has no
grpcio/protobuf, but OTLP defines a second standard transport —
**OTLP/HTTP with the JSON encoding** (POST /v1/metrics,
Content-Type: application/json; opentelemetry-proto's documented JSON
mapping, int64s as decimal strings) — which stdlib can serve.  This
test closes the "no wire-level hop" gap as far as the sandbox allows:

  OTLP exporter (urllib POST over real TCP)
    → receiver endpoint (http.server, /v1/metrics, 200/404 semantics)
    → spool dir (the micro-batch transport S8 models)
    → the S11 parser (`from_json` + explodes, JVM-side)
    → long metric rows

The payloads cross an actual socket; the bytes the parser sees are the
bytes the exporter sent.  Every prior OTLP test injected strings into a
DataFrame directly — this one proves the listening/accept/spool half.
"""

from __future__ import annotations

import http.server
import json
import threading
import urllib.error
import urllib.request

import pytest

from project_obsidian_core_spark.sources import otlp
from tests.test_otlp_receiver import PAYLOAD


def _second_payload() -> dict:
    """A PG resource with one gauge point — distinct instance/system so
    the assertion can prove both wire documents landed."""
    return {
        "resourceMetrics": [
            {
                "resource": {
                    "attributes": [
                        {
                            "key": "service.instance.id",
                            "value": {"stringValue": "pg-7"},
                        },
                        {
                            "key": "db.system",
                            "value": {"stringValue": "postgresql"},
                        },
                    ]
                },
                "scopeMetrics": [
                    {
                        "scope": {
                            "name": "otelcol/postgresqlreceiver",
                            "version": "0.96.0",
                        },
                        "metrics": [
                            {
                                "name": "postgresql.backends",
                                "unit": "1",
                                "gauge": {
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1704067260000000000",
                                            "asInt": "17",
                                            "attributes": [],
                                        }
                                    ]
                                },
                            }
                        ],
                    }
                ],
            }
        ]
    }


class _OtlpHttpReceiver(http.server.ThreadingHTTPServer):
    """OTLP/HTTP metrics endpoint spooling request bodies to a dir."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        self.n_received = 0
        super().__init__(("127.0.0.1", 0), _Handler)


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 (stdlib contract)
        srv: _OtlpHttpReceiver = self.server  # type: ignore[assignment]
        if self.path != "/v1/metrics":
            self.send_error(404)
            return
        if "application/json" not in (self.headers.get("Content-Type") or ""):
            self.send_error(415)
            return
        body = self.rfile.read(int(self.headers["Content-Length"]))
        srv.n_received += 1
        # one spool file per export request — the S8 micro-batch unit
        with open(f"{srv.spool_dir}/req_{srv.n_received:04d}.json", "wb") as fh:
            fh.write(body)
        # ExportMetricsServiceResponse{} — empty JSON object per spec
        resp = b"{}"
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # silence per-request stderr lines
        pass


def _post(url: str, doc: dict, content_type: str = "application/json"):
    req = urllib.request.Request(
        url,
        data=json.dumps(doc).encode(),
        headers={"Content-Type": content_type},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=10)


def test_otlp_http_wire_ingest(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    srv = _OtlpHttpReceiver(str(spool))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"

        # --- endpoint semantics over the real socket ------------------
        with _post(f"{base}/v1/metrics", PAYLOAD) as r:
            assert r.status == 200
            assert json.loads(r.read()) == {}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/v1/traces", PAYLOAD)
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/v1/metrics", PAYLOAD, content_type="text/plain")
        assert ei.value.code == 415
        with _post(f"{base}/v1/metrics", _second_payload()) as r:
            assert r.status == 200

        # two accepted export requests → two spool files
        assert srv.n_received == 2
        assert len(list(spool.glob("req_*.json"))) == 2

        # --- the S11 parser over the spooled wire bytes ---------------
        raw = spark.read.text(str(spool)).withColumnRenamed("value", "payload")
        rows = {
            (r["instance_id"], r["db_system"], r["metric_name"]): r
            for r in otlp.to_metrics_long(
                otlp.parse_otlp_metrics(raw)
            ).collect()
        }
        threads = rows[("db-1", "mysql", "mysql.threads")]
        assert threads["metric_value"] == 42.0
        backends = rows[("pg-7", "postgresql", "postgresql.backends")]
        assert backends["metric_value"] == 17.0
        # the monotonic sum from PAYLOAD also crossed the wire
        assert ("db-1", "mysql", "mysql.questions") in rows
    finally:
        srv.shutdown()
        srv.server_close()
