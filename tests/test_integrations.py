"""MES/ERP/QMS result forwarding (iqc_tpu/serving/integrations.py).

The reference declares the integrations block (/root/reference/config/
config.yaml:245-263) and ships no integration code. These tests pin the
implemented forwarder: per-system auth headers, real-time vs batch QMS
mode, retry accounting, and the process_image wiring.
"""

import base64
import json

import numpy as np

from iqc_tpu.serving.integrations import (
    IntegrationForwarder,
    inspection_record,
)


def _result(grade="C", pf="FAIL", defects=3):
    return {
        "quality_assessment": {
            "quality_grade": grade, "pass_fail_status": pf,
            "total_defects": defects,
            "severity_breakdown": {"critical": 1, "major": 2, "minor": 0},
            "quality_score": 41.5,
        },
        "anomaly_score": 0.7,
    }


def test_record_schema():
    rec = inspection_record(_result())
    assert rec["source"] == "iqc_tpu"
    assert rec["pass_fail"] == "FAIL" and rec["total_defects"] == 3
    assert rec["severity_breakdown"]["critical"] == 1
    assert rec["quality_score"] == 41.5


def test_per_system_auth_and_delivery():
    posts = []

    def sender(url, body, headers, timeout):
        posts.append((url, json.loads(body), dict(headers)))
        return 200

    fwd = IntegrationForwarder({
        "mes": {"enabled": True, "endpoint": "http://mes.test/api",
                "api_key": "k123"},
        "erp": {"enabled": True, "endpoint": "http://erp.test/api",
                "username": "qc", "password": "pw"},
        "qms": {"enabled": False, "endpoint": "http://qms.test/api"},
    }, sender=sender)
    assert fwd.enabled and len(fwd.systems) == 2
    assert fwd.submit(_result())
    assert fwd.flush()
    assert {u for u, _, _ in posts} == {"http://mes.test/api",
                                        "http://erp.test/api"}
    by_url = {u: h for u, _, h in posts}
    assert by_url["http://mes.test/api"]["X-API-Key"] == "k123"
    expect = "Basic " + base64.b64encode(b"qc:pw").decode()
    assert by_url["http://erp.test/api"]["Authorization"] == expect
    assert fwd.stats["sent"] == 2 and fwd.stats["failed"] == 0
    fwd.close()


def test_qms_batch_mode_accumulates():
    posts = []
    fwd = IntegrationForwarder({
        "qms": {"enabled": True, "endpoint": "http://qms.test/api",
                "integration_type": "batch", "batch_size": 3},
    }, sender=lambda u, b, h, t: posts.append(json.loads(b)) or 200)
    for _ in range(2):
        fwd.submit(_result())
    fwd.flush()  # partial batch flushes on demand
    assert len(posts) == 1 and len(posts[0]["records"]) == 2
    posts.clear()
    for _ in range(3):
        fwd.submit(_result())
    fwd.flush()
    assert posts and len(posts[0]["records"]) == 3  # size-triggered
    fwd.close()


def test_failure_retries_and_counts():
    calls = []

    def down(url, body, headers, timeout):
        calls.append(url)
        raise OSError("unreachable")

    fwd = IntegrationForwarder(
        {"mes": {"enabled": True, "endpoint": "http://down.test/api"}},
        sender=down, retries=2,
    )
    fwd.submit(_result())
    fwd.flush()
    assert len(calls) == 3
    assert fwd.stats["failed"] == 1 and fwd.stats["sent"] == 0
    fwd.close()


def test_disabled_without_config():
    fwd = IntegrationForwarder(None)
    assert not fwd.enabled
    assert not fwd.submit(_result())
    # enabled flag without endpoint is ignored
    fwd2 = IntegrationForwarder({"mes": {"enabled": True}})
    assert not fwd2.enabled


def test_process_image_forwards(tiny_config):
    """End-to-end: process_image -> IntegrationForwarder sink."""
    from iqc_tpu.serving.app import QualityControlSystem

    cfg = tiny_config.update({"integrations": {
        "mes": {"enabled": True, "endpoint": "http://mes.test/api",
                "api_key": "k"},
    }})
    system = QualityControlSystem(config=cfg)
    posts = []
    system.integrations._sender = (
        lambda u, b, h, t: posts.append(json.loads(b)) or 200)
    assert system.initialize_models()
    img = np.random.default_rng(0).integers(
        0, 255, tiny_config.processing.input_size + (3,), np.uint8)
    result = system.process_image(img)
    assert "error" not in result
    system.integrations.flush()
    assert len(posts) == 1
    assert posts[0]["source"] == "iqc_tpu"
    assert posts[0]["pass_fail"] in ("PASS", "FAIL", "CONDITIONAL")
