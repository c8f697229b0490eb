"""Webhook alert delivery + threshold rules (iqc_tpu/serving/alerts.py).

The reference declares alerts.thresholds + webhook config
(/root/reference/config/config.yaml:76-97) but ships no notification code;
these tests pin the implemented behavior: rule evaluation, cooldown
suppression, retry accounting, and real HTTP delivery to a local sink.
"""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from iqc_tpu.config import AlertsConfig, AlertThresholds, SystemConfig
from iqc_tpu.serving.alerts import AlertDispatcher, threshold_alerts


def _result(critical=0, major=0, minor=0, avg_conf=0.9):
    total = critical + major + minor
    return {
        "quality_assessment": {
            "severity_breakdown": {"critical": critical, "major": major,
                                   "minor": minor},
            "total_defects": total,
            "average_confidence": avg_conf,
        }
    }


def test_threshold_rules_fire_and_stay_quiet():
    thr = AlertThresholds()  # reference defaults: 1 crit, 2 major, 3.0, 0.6
    assert threshold_alerts(_result(), thr) == []  # clean image
    rules = {a["rule"] for a in threshold_alerts(_result(critical=1), thr)}
    assert rules == {"critical_defects"}
    rules = {a["rule"] for a in threshold_alerts(_result(major=2), thr)}
    assert rules == {"major_defects"}
    assert threshold_alerts(_result(major=1), thr) == []  # below threshold
    rules = {a["rule"]
             for a in threshold_alerts(_result(minor=1, avg_conf=0.4), thr)}
    assert rules == {"low_confidence"}
    # low_confidence needs defects: a clean image's confidence is vacuous
    assert threshold_alerts(_result(avg_conf=0.0), thr) == []
    rules = {a["rule"]
             for a in threshold_alerts(_result(), thr, defect_rate=3.5)}
    assert rules == {"high_defect_rate"}
    # everything at once
    alerts = threshold_alerts(_result(critical=2, major=3, avg_conf=0.3),
                              thr, defect_rate=9.0)
    assert {a["rule"] for a in alerts} == {
        "critical_defects", "major_defects", "low_confidence",
        "high_defect_rate",
    }


def test_dispatcher_cooldown_and_counters():
    sent = []
    cfg = AlertsConfig(webhook_notifications=True,
                       webhook_url="http://sink.test/hook",
                       cooldown_seconds=60.0, retries=0)
    now = [0.0]
    d = AlertDispatcher(cfg, sender=lambda u, b, h, t: sent.append(u) or 200,
                        clock=lambda: now[0])
    a = {"type": "threshold", "rule": "critical_defects", "message": "x"}
    assert d.submit(a)
    assert not d.submit(a)          # inside cooldown: suppressed
    now[0] = 61.0
    assert d.submit(a)              # cooldown expired
    b = {"type": "threshold", "rule": "major_defects", "message": "y"}
    assert d.submit(b)              # different rule: independent cooldown
    assert d.flush()
    assert d.stats["submitted"] == 4
    assert d.stats["suppressed"] == 1
    assert d.stats["sent"] == 3
    assert d.stats["failed"] == 0
    d.close()


def test_spc_alerts_cooldown_per_metric_and_full_queue_no_cooldown():
    """(a) SPC alerts for different metrics must not share a cooldown key
    (they carry `metric`); (b) an alert dropped by a full queue must not
    start the cooldown."""
    sent = []
    cfg = AlertsConfig(webhook_notifications=True,
                       webhook_url="http://sink.test/h",
                       cooldown_seconds=60.0)
    now = [0.0]
    d = AlertDispatcher(cfg, sender=lambda u, b, h, t: sent.append(u) or 200,
                        clock=lambda: now[0])
    a1 = {"type": "control_violation", "metric": "defect_count"}
    a2 = {"type": "control_violation", "metric": "avg_confidence"}
    assert d.submit(a1)
    assert d.submit(a2)  # distinct metric: independent cooldown
    assert not d.submit(a1)  # same metric: suppressed
    assert d.stats["suppressed"] == 1
    d.close()

    d2 = AlertDispatcher(cfg, sender=lambda u, b, h, t: 200,
                         clock=lambda: now[0], max_queue=1)
    # no worker drains (never started): fill the queue, then overflow
    d2._queue.put_nowait({})
    assert not d2.submit(a1)         # dropped: queue full
    assert d2.stats["dropped"] == 1
    d2._queue.get_nowait()           # capacity frees
    assert d2.submit(a1)             # NOT cooldown-suppressed
    d2.close()


def test_runtime_config_update_rebuilds_alerting(tiny_config):
    """PUT /api/config semantics: enabling webhooks at runtime must take
    effect on the live dispatcher (it held the old config by reference)."""
    from iqc_tpu.serving.app import QualityControlSystem

    system = QualityControlSystem(config=tiny_config)
    assert not system.alert_dispatcher.enabled
    system.update_config({"alerts": {
        "webhook_notifications": True, "webhook_url": "http://sink.test/h",
    }})
    assert system.alert_dispatcher.enabled
    system.update_config({"storage": {
        "enabled": True, "database_path": "/tmp/iqc_rtcfg_qc.sqlite",
    }})
    assert system.result_store is not None
    system.update_config({"storage": {"enabled": False}})
    assert system.result_store is None


def test_dispatcher_disabled_without_urls():
    d = AlertDispatcher(AlertsConfig(webhook_notifications=True))
    assert not d.enabled
    assert not d.submit({"type": "x", "rule": "y"})
    d2 = AlertDispatcher(AlertsConfig(webhook_url="http://x.test/"))
    assert not d2.enabled  # webhook_notifications off


def test_dispatcher_retries_then_counts_failure():
    calls = []

    def flaky(url, body, headers, timeout):
        calls.append(url)
        raise OSError("connection refused")

    cfg = AlertsConfig(webhook_notifications=True,
                       webhook_url="http://down.test/hook",
                       retries=2, cooldown_seconds=0.0)
    d = AlertDispatcher(cfg, sender=flaky)
    assert d.submit({"type": "spc", "rule": "r1"})
    assert d.flush()
    assert len(calls) == 3          # initial + 2 retries
    assert d.stats["failed"] == 1 and d.stats["sent"] == 0
    d.close()


def test_real_http_delivery_to_local_sink():
    received = []

    class Sink(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Sink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/alerts"
        cfg = AlertsConfig(webhook_notifications=True, webhook_url=url,
                           cooldown_seconds=0.0)
        d = AlertDispatcher(cfg)
        d.submit({"type": "threshold", "rule": "critical_defects",
                  "message": "2 critical defect(s)", "value": 2})
        assert d.flush()
        deadline = time.monotonic() + 3
        while not received and time.monotonic() < deadline:
            time.sleep(0.01)
        assert received and received[0]["source"] == "iqc_tpu"
        assert received[0]["alert"]["rule"] == "critical_defects"
        d.close()
    finally:
        srv.shutdown()


def test_alerts_config_round_trip():
    raw = {
        "alerts": {
            "webhook_notifications": True,
            "webhook_url": "http://a.test/h",
            "webhook_urls": ["http://b.test/h"],
            "cooldown_seconds": 5,
            "thresholds": {"critical_defects": 3, "low_confidence": 0.5},
            "email": {"smtp_server": "smtp.example.com"},
        }
    }
    cfg = SystemConfig.from_dict(raw)
    assert cfg.alerts.webhook_notifications
    assert cfg.alerts.urls() == ("http://a.test/h", "http://b.test/h")
    assert cfg.alerts.thresholds.critical_defects == 3
    assert cfg.alerts.thresholds.major_defects == 2  # default preserved
    assert cfg.alerts.email["smtp_server"] == "smtp.example.com"
    d = cfg.to_dict()
    assert d["alerts"]["thresholds"]["low_confidence"] == 0.5
    # invalid values rejected
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"alerts": {"timeout_seconds": 0}})


def test_system_emits_threshold_alerts_through_dispatcher(tiny_config):
    """End-to-end: process_image -> threshold rule -> dispatcher sink."""
    from iqc_tpu.serving.app import QualityControlSystem

    posts = []
    cfg = tiny_config.update({"alerts": {
        "webhook_notifications": True,
        "webhook_url": "http://sink.test/hook",
        "cooldown_seconds": 0.0,
    }})
    system = QualityControlSystem(config=cfg)
    system.alert_dispatcher._sender = lambda u, b, h, t: posts.append(
        json.loads(b)) or 200
    assert system.initialize_models()
    import numpy as np

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, cfg.processing.input_size + (3,), np.uint8)
    # synthesize a hot image: a dark elliptical blob reads as a defect
    h, w = cfg.processing.input_size
    img[h // 4: 3 * h // 4, w // 4: 3 * w // 4] //= 4
    result = system.process_image(img)
    assert "error" not in result
    system.alert_dispatcher.flush()
    # whether a defect fires depends on the untrained tiny model; the
    # contract is structural: every delivered post is a well-formed alert
    for p in posts:
        assert p["source"] == "iqc_tpu" and "rule" in p["alert"]
    # and the dispatcher accounting is consistent
    s = system.alert_dispatcher.stats
    assert s["sent"] == len(posts) and s["failed"] == 0


# ---------------------------------------------------------------------------
# email transport (reference alerts.email block, config.yaml:89-95 —
# declared there, implemented here via stdlib smtplib)
# ---------------------------------------------------------------------------


class _SmtpSink(threading.Thread):
    """Minimal local SMTP server: accepts one session, records the
    envelope + message body (smtpd was removed in Python 3.12)."""

    def __init__(self):
        super().__init__(daemon=True)
        import socket

        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.mail_from = None
        self.rcpt_to = []
        self.data = b""
        self.ready = threading.Event()

    def run(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 localhost iqc-test-smtp\r\n")
        in_data = False
        body = []
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    self.data = b"".join(body)
                    conn.sendall(b"250 OK\r\n")
                    in_data = False
                else:
                    body.append(line)
                continue
            verb = line.rstrip(b"\r\n").split(b":")[0].split(b" ")[0].upper()
            if verb in (b"EHLO", b"HELO"):
                conn.sendall(b"250-localhost\r\n250 HELP\r\n")
            elif verb == b"MAIL":
                self.mail_from = line.decode().split(":", 1)[1].strip()
                conn.sendall(b"250 OK\r\n")
            elif verb == b"RCPT":
                self.rcpt_to.append(line.decode().split(":", 1)[1].strip())
                conn.sendall(b"250 OK\r\n")
            elif verb == b"DATA":
                conn.sendall(b"354 go\r\n")
                in_data = True
            elif verb == b"QUIT":
                conn.sendall(b"221 bye\r\n")
                self.ready.set()
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()
        self.sock.close()


def test_email_delivery_to_local_smtp_sink():
    """send_email_smtp speaks real SMTP end to end against a local sink."""
    from iqc_tpu.serving.alerts import send_email_smtp

    sink = _SmtpSink()
    sink.start()
    settings = {
        "smtp_server": "127.0.0.1", "smtp_port": sink.port,
        "username": "qc-system@company.com",
        "recipients": ["quality.manager@company.com",
                       "production.supervisor@company.com"],
    }
    send_email_smtp(settings, "[IQC CRITICAL] critical_defects",
                    "3 critical defect(s) detected", timeout=5.0)
    assert sink.ready.wait(5.0)
    assert "qc-system@company.com" in sink.mail_from
    assert len(sink.rcpt_to) == 2
    assert any("quality.manager" in r for r in sink.rcpt_to)
    text = sink.data.decode()
    assert "[IQC CRITICAL] critical_defects" in text
    assert "3 critical defect(s) detected" in text


def test_dispatcher_email_routing_and_counters():
    """email_notifications on (webhooks off): alerts go to the email
    transport with the structured subject, and email_sent counts."""
    sent = []

    def fake_email(settings, subject, body, timeout):
        sent.append((settings, subject, body))

    cfg = AlertsConfig(
        email_notifications=True,
        email={"smtp_server": "smtp.test", "smtp_port": 2525,
               "recipients": ["qa@test"]},
        cooldown_seconds=0.0,
    )
    d = AlertDispatcher(cfg, email_sender=fake_email)
    assert d.email_enabled and d.enabled and not d.webhooks_enabled
    assert d.submit({"type": "threshold", "rule": "critical_defects",
                     "severity": "critical", "message": "2 critical"})
    d.flush()
    assert len(sent) == 1
    settings, subject, body = sent[0]
    assert settings["smtp_server"] == "smtp.test"
    assert subject == "[IQC CRITICAL] critical_defects"
    assert "2 critical" in body
    assert d.stats["email_sent"] == 1 and d.stats["email_failed"] == 0
    assert d.stats["sent"] == 0  # no webhook leg
    d.close()


def test_dispatcher_email_failure_counts_after_retries():
    calls = []

    def broken_email(settings, subject, body, timeout):
        calls.append(1)
        raise ConnectionRefusedError("no smtp")

    cfg = AlertsConfig(
        email_notifications=True,
        email={"smtp_server": "smtp.test", "recipients": ["qa@test"]},
        cooldown_seconds=0.0, retries=2,
    )
    d = AlertDispatcher(cfg, email_sender=broken_email)
    d.submit({"type": "threshold", "rule": "major_defects",
              "severity": "major", "message": "x"})
    d.flush()
    assert len(calls) == 3  # initial + 2 retries
    assert d.stats["email_failed"] == 1 and d.stats["email_sent"] == 0
    d.close()


def test_email_config_validation():
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"alerts": {"email_notifications": True}})
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"alerts": {
            "email_notifications": True,
            "email": {"smtp_server": "s", "recipients": ["a@b"],
                      "smtp_port": "not-a-port"},
        }})
    # the reference's own block (config.yaml:76-95) validates clean
    cfg = SystemConfig.from_dict({"alerts": {
        "email_notifications": True,
        "webhook_notifications": True,
        "thresholds": {"critical_defects": 1, "major_defects": 2,
                       "high_defect_rate": 3.0, "low_confidence": 0.6},
        "email": {"smtp_server": "smtp.company.com", "smtp_port": 587,
                  "username": "qc-system@company.com",
                  "recipients": ["quality.manager@company.com",
                                 "production.supervisor@company.com"]},
        "webhook_url": "https://your-webhook.com/alerts",
    }})
    assert cfg.alerts.email["smtp_port"] == 587


def test_dispatcher_both_transports_fire():
    posts, mails = [], []
    cfg = AlertsConfig(
        webhook_notifications=True, webhook_url="http://sink/hook",
        email_notifications=True,
        email={"smtp_server": "smtp.test", "recipients": ["qa@test"]},
        cooldown_seconds=0.0,
    )
    d = AlertDispatcher(
        cfg, sender=lambda u, b, h, t: posts.append(u) or 200,
        email_sender=lambda s, subj, body, t: mails.append(subj),
    )
    d.submit({"type": "spc", "metric": "defect_rate", "severity": "major",
              "message": "ooc"})
    d.flush()
    assert posts == ["http://sink/hook"]
    assert mails == ["[IQC MAJOR] defect_rate"]
    assert d.stats["sent"] == 1 and d.stats["email_sent"] == 1
    d.close()


# -- SMS transport (r5: the reference declares only the sms_notifications
# switch, config.yaml:78, with no transport anywhere; implemented as an
# HTTP SMS gateway — serving/alerts.send_sms_http) -----------------------------


def test_sms_settings_ok():
    from iqc_tpu.serving.alerts import sms_settings_ok

    assert not sms_settings_ok({})
    assert not sms_settings_ok({"gateway_url": "http://gw/send"})
    assert not sms_settings_ok({"recipients": ["+15550100"]})
    assert sms_settings_ok({"gateway_url": "http://gw/send",
                            "recipients": ["+15550100"]})


def test_send_sms_http_posts_per_recipient_with_bearer():
    from iqc_tpu.serving.alerts import send_sms_http

    posts = []

    def fake_post(url, body, headers, timeout):
        posts.append((url, json.loads(body), dict(headers)))
        return 200

    send_sms_http(
        {"gateway_url": "http://gw/send", "api_key": "k123",
         "from": "QC-LINE-1", "recipients": ["+15550100", "+15550101"]},
        "[IQC CRITICAL] critical_defects: 2 found", 3.0, post=fake_post)
    assert [p[1]["to"] for p in posts] == ["+15550100", "+15550101"]
    assert all(p[0] == "http://gw/send" for p in posts)
    assert all(p[1]["from"] == "QC-LINE-1" for p in posts)
    assert all(p[2]["Authorization"] == "Bearer k123" for p in posts)
    assert posts[0][1]["body"].startswith("[IQC CRITICAL]")


def test_send_sms_http_raises_on_gateway_error():
    from iqc_tpu.serving.alerts import send_sms_http

    with pytest.raises(RuntimeError):
        send_sms_http({"gateway_url": "http://gw/send",
                       "recipients": ["+15550100"]},
                      "msg", 3.0, post=lambda u, b, h, t: 503)


def test_dispatcher_sms_delivery_counters_and_truncation():
    texts = []
    cfg = AlertsConfig(
        sms_notifications=True,
        sms={"gateway_url": "http://gw/send", "recipients": ["+15550100"]},
        cooldown_seconds=0.0,
    )
    d = AlertDispatcher(
        cfg, sms_post=lambda u, b, h, t: texts.append(json.loads(b)) or 200)
    assert d.sms_enabled and d.enabled and not d.webhooks_enabled
    long_msg = "x" * 400
    d.submit({"type": "threshold", "rule": "critical_defects",
              "severity": "critical", "message": long_msg})
    d.flush()
    assert d.stats["sms_sent"] == 1 and d.stats["sms_failed"] == 0
    body = texts[0]["body"]
    assert body.startswith("[IQC CRITICAL] critical_defects:")
    assert len(body) <= 160  # one GSM-7 segment


def test_dispatcher_sms_retries_then_counts_failure():
    calls = []
    cfg = AlertsConfig(
        sms_notifications=True, retries=2,
        sms={"gateway_url": "http://gw/send", "recipients": ["+15550100"]},
        cooldown_seconds=0.0,
    )
    d = AlertDispatcher(cfg,
                        sms_post=lambda u, b, h, t: calls.append(u) or 500)
    d.submit({"type": "spc", "metric": "defect_rate", "message": "ooc"})
    d.flush()
    assert len(calls) == 3  # initial + 2 retries
    assert d.stats["sms_failed"] == 1 and d.stats["sms_sent"] == 0
    d.close()


def test_sms_real_http_delivery_to_local_sink():
    """send_sms_http speaks real HTTP end to end against a local gateway."""
    received = []

    class Gateway(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append((self.headers.get("Authorization"),
                             json.loads(self.rfile.read(n))))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Gateway)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = AlertsConfig(
            sms_notifications=True,
            sms={"gateway_url": f"http://127.0.0.1:{srv.server_port}/send",
                 "api_key": "secret", "recipients": ["+15550100"]},
            cooldown_seconds=0.0,
        )
        d = AlertDispatcher(cfg)
        d.submit({"type": "threshold", "rule": "major_defects",
                  "severity": "major", "message": "3 major defect(s)"})
        assert d.flush()
        deadline = time.monotonic() + 3
        while not received and time.monotonic() < deadline:
            time.sleep(0.01)
        auth, body = received[0]
        assert auth == "Bearer secret"
        assert body["to"] == "+15550100"
        assert "[IQC MAJOR] major_defects" in body["body"]
        d.close()
    finally:
        srv.shutdown()


def test_sms_config_validation():
    with pytest.raises(ValueError):
        AlertsConfig(sms_notifications=True).validate()
    with pytest.raises(ValueError):
        AlertsConfig(sms_notifications=True,
                     sms={"gateway_url": "http://gw"}).validate()
    AlertsConfig(sms_notifications=True,
                 sms={"gateway_url": "http://gw",
                      "recipients": ["+1555"]}).validate()
