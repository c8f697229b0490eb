"""Result/image persistence (iqc_tpu/storage.py) + /api/results routes.

The reference declares the storage block (/root/reference/config/
config.yaml:100-122) and ships SQLAlchemy/redis in requirements but zero
storage code; these tests pin the implemented sqlite layer: write/query
round trip, retention purge, image archival + size-cap pruning, the
reference's nested YAML shape, and the serving endpoints.
"""

import json
import threading
import time

import numpy as np
import pytest

from iqc_tpu.config import StorageConfig, SystemConfig
from iqc_tpu.storage import ResultStore


def _result(grade="B", pf="PASS", defects=2, score=0.12, ms=7.5):
    return {
        "quality_assessment": {
            "quality_grade": grade, "pass_fail_status": pf,
            "total_defects": defects,
        },
        "anomaly_score": score,
        "metadata": {"total_inference_time_ms": ms},
        "detections": [{"class_name": "crack"}] * defects,
    }


def test_roundtrip_query_and_summary(tmp_path):
    cfg = StorageConfig(enabled=True,
                        database_path=str(tmp_path / "qc.sqlite"))
    store = ResultStore(cfg)
    store.save_result(_result("A", "PASS", 0))
    store.save_result(_result("F", "FAIL", 5, score=0.9))
    rows = store.query(limit=10)
    assert len(rows) == 2
    assert rows[0]["quality_grade"] == "F"  # most recent first
    assert rows[0]["detail"]["detections"][0]["class_name"] == "crack"
    assert store.query(pass_fail="FAIL")[0]["total_defects"] == 5
    s = store.summary()
    assert s["total_results"] == 2 and s["failed"] == 1
    assert s["pass_rate"] == 0.5
    assert s["grade_distribution"] == {"A": 1, "F": 1}
    store.close()


def test_detail_omitted_when_disabled(tmp_path):
    cfg = StorageConfig(enabled=True, save_detailed_results=False,
                        database_path=str(tmp_path / "qc.sqlite"))
    store = ResultStore(cfg)
    store.save_result(_result())
    (row,) = store.query()
    assert "detail" not in row
    store.close()


def test_retention_purges_old_rows(tmp_path):
    now = [1_000_000.0]
    cfg = StorageConfig(enabled=True, retention_days=1,
                        database_path=str(tmp_path / "qc.sqlite"))
    store = ResultStore(cfg, clock=lambda: now[0])
    store.save_result(_result())
    now[0] += 2 * 86400.0  # two days later
    store.save_result(_result())  # hourly auto-purge fires on this write
    store.purge()
    assert store.summary()["total_results"] == 1  # only the fresh row left
    store.close()


def test_image_archival_and_size_cap(tmp_path):
    cfg = StorageConfig(
        enabled=True, save_processed_images=True, save_failed_images=True,
        database_path=str(tmp_path / "qc.sqlite"),
        image_storage_path=str(tmp_path / "imgs"),
        max_storage_gb=2e-6,  # ~2 KB: forces size-cap pruning
    )
    store = ResultStore(cfg)
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    p1 = store.save_image(img, failed=False)
    time.sleep(0.02)
    p2 = store.save_image(img, failed=True)
    assert p1 and "/passed/" in p1
    assert p2 and "/failed/" in p2
    store.purge()  # cap ~2 KB < two JPEGs: oldest pruned
    import os

    remaining = [f for _, _, fs in os.walk(str(tmp_path / "imgs")) for f in fs]
    assert len(remaining) < 2
    store.close()


def test_save_image_respects_switches(tmp_path):
    cfg = StorageConfig(enabled=True, save_processed_images=False,
                        save_failed_images=False,
                        database_path=str(tmp_path / "qc.sqlite"),
                        image_storage_path=str(tmp_path / "imgs"))
    store = ResultStore(cfg)
    img = np.zeros((8, 8, 3), np.uint8)
    assert store.save_image(img, failed=False) is None
    assert store.save_image(img, failed=True) is None
    store.close()


def test_concurrent_writes_are_safe(tmp_path):
    cfg = StorageConfig(enabled=True,
                        database_path=str(tmp_path / "qc.sqlite"))
    store = ResultStore(cfg)
    errors = []

    def writer():
        try:
            for _ in range(20):
                store.save_result(_result())
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert store.summary()["total_results"] == 80
    store.close()


def test_backup_snapshot_restores_and_prunes(tmp_path):
    """Online sqlite backup (reference production.backup,
    config.yaml:238-242): the snapshot reopens with identical rows; stale
    snapshots past backup_retention_days are pruned; maybe_backup honors
    the frequency window."""
    import os
    import sqlite3

    bdir = str(tmp_path / "backups")
    cfg = StorageConfig(enabled=True, backup_enabled=True,
                        backup_path=bdir, backup_frequency="daily",
                        backup_retention_days=30,
                        database_path=str(tmp_path / "qc.sqlite"))
    store = ResultStore(cfg)
    store.save_result(_result("B", "PASS", 1))
    store.save_result(_result("F", "FAIL", 4))
    if store._maint_thread is not None:  # settle background maintenance
        store._maint_thread.join(timeout=5)

    # plant a stale snapshot beyond retention
    stale = os.path.join(bdir, "qc_database-20000101-000000.sqlite")
    os.makedirs(bdir, exist_ok=True)
    open(stale, "w").close()
    os.utime(stale, (1, 1))

    snap = store.backup()
    assert not os.path.exists(stale)  # pruned
    db = sqlite3.connect(snap)
    n, fails = db.execute(
        "SELECT COUNT(*), SUM(pass_fail='FAIL') FROM results").fetchone()
    db.close()
    assert (n, fails) == (2, 1)

    # fresh snapshot exists -> the scheduled path does nothing
    assert store.maybe_backup() is None
    # age ALL snapshots past the daily window (save_result's hourly tick
    # auto-backed-up too) -> a new snapshot is taken
    before = set(os.listdir(bdir))
    for f in before:
        os.utime(os.path.join(bdir, f), (1, 1))
    snap2 = store.maybe_backup()
    assert snap2 and os.path.basename(snap2) not in before
    store.close()

    # disabled -> never backs up
    cfg2 = StorageConfig(enabled=True, backup_enabled=False,
                         database_path=str(tmp_path / "qc2.sqlite"))
    store2 = ResultStore(cfg2)
    assert store2.maybe_backup() is None
    store2.close()


def test_reference_nested_yaml_shape(tmp_path):
    cfg = SystemConfig.from_dict({
        "storage": {
            "enabled": True,
            "database": {"type": "sqlite", "name": str(tmp_path / "db.sqlite")},
            "image_storage": {"storage_path": "x/imgs", "retention_days": 7,
                              "save_failed_images": False},
            "results_storage": {"save_detailed_results": False},
        }
    })
    assert cfg.storage.database_path.endswith("db.sqlite")
    assert cfg.storage.image_storage_path == "x/imgs"
    # reference production.backup nesting maps onto the backup knobs
    cfg_b = SystemConfig.from_dict({"production": {"backup": {
        "enabled": True, "frequency": "weekly", "retention_days": 9,
        "backup_path": "bk/"}}})
    assert cfg_b.storage.backup_enabled
    assert cfg_b.storage.backup_frequency == "weekly"
    assert cfg_b.storage.backup_retention_days == 9
    assert cfg_b.storage.backup_path == "bk/"
    assert "production" in cfg_b.extra  # passthrough preserved
    assert cfg.storage.retention_days == 7
    assert not cfg.storage.save_failed_images
    assert not cfg.storage.save_detailed_results
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"storage": {
            "enabled": True, "database": {"type": "postgresql"}}})


def test_results_endpoints(tmp_path, tiny_config):
    from iqc_tpu.serving.app import QualityControlSystem, create_app

    cfg = tiny_config.update({"storage": {
        "enabled": True,
        "database_path": str(tmp_path / "qc.sqlite"),
        "image_storage_path": str(tmp_path / "imgs"),
    }})
    system = QualityControlSystem(config=cfg)
    assert system.initialize_models()
    system.result_store.save_result(_result("C", "FAIL", 3))
    app = create_app(system, initialize=False)

    import io as _io

    def call(path, query=""):
        env = {"REQUEST_METHOD": "GET", "PATH_INFO": path,
               "QUERY_STRING": query, "CONTENT_TYPE": "",
               "CONTENT_LENGTH": "0", "REMOTE_ADDR": "127.0.0.1",
               "wsgi.input": _io.BytesIO(b"")}
        cap = {}

        def sr(status, headers):
            cap["status"] = int(status.split()[0])

        body = b"".join(app(env, sr))
        return cap["status"], json.loads(body)

    st, data = call("/api/results", "limit=5&pass_fail=FAIL")
    assert st == 200 and data["count"] == 1
    assert data["results"][0]["quality_grade"] == "C"
    st, data = call("/api/results", "pass_fail=nonsense")
    assert st == 400
    st, data = call("/api/results/summary")
    assert st == 200 and data["total_results"] == 1

    # disabled storage -> 503
    system2 = QualityControlSystem(config=tiny_config)
    app2 = create_app(system2, initialize=False)

    def call2(path):
        env = {"REQUEST_METHOD": "GET", "PATH_INFO": path,
               "QUERY_STRING": "", "CONTENT_TYPE": "",
               "CONTENT_LENGTH": "0", "REMOTE_ADDR": "127.0.0.1",
               "wsgi.input": _io.BytesIO(b"")}
        cap = {}

        def sr(status, headers):
            cap["status"] = int(status.split()[0])

        body = b"".join(app2(env, sr))
        return cap["status"], json.loads(body)

    st, data = call2("/api/results")
    assert st == 503
