"""Process-level autoscaling (iqc_tpu/serving/scaling.py) + worker pool.

The reference declares ``production.scaling`` (auto_scale, min/max
instances, cpu/memory thresholds — /root/reference/config/config.yaml:
221-228) and ships no scaling code; these tests pin the implemented
behavior: /proc sampling, threshold decisions with hysteresis, clamping,
config parsing, and the serving worker pool actually resizing.
"""

import threading
import time

import pytest

from iqc_tpu.config import ScalingConfig, SystemConfig
from iqc_tpu.serving.scaling import AutoScaler, host_utilization


def _cfg(**kw):
    base = dict(auto_scale=True, min_instances=1, max_instances=4,
                cpu_threshold=80.0, memory_threshold=85.0,
                interval_seconds=0.01, scale_down_samples=2)
    base.update(kw)
    return ScalingConfig(**base)


def test_host_utilization_reads_proc():
    cpu, mem = host_utilization(interval=0.05)
    assert 0.0 <= cpu <= 100.0
    assert 0.0 < mem <= 100.0


def test_scale_up_on_cpu_and_clamp_at_max():
    sizes = []
    samples = iter([(90, 10), (95, 10), (99, 10), (99, 10), (99, 10)])
    s = AutoScaler(_cfg(max_instances=3), resize=lambda n: sizes.append(n) or n,
                   sample_fn=lambda: next(samples))
    for _ in range(5):
        s.step()
    assert sizes == [2, 3]          # clamped at max_instances=3
    assert s.instances == 3
    assert s.stats["scale_ups"] == 2 and s.stats["scale_downs"] == 0


def test_scale_up_on_memory_alone():
    s = AutoScaler(_cfg(), resize=lambda n: n,
                   sample_fn=lambda: (10.0, 90.0))
    assert s.step() == 2


def test_scale_down_needs_consecutive_quiet_samples():
    sizes = []
    # up, up, then quiet: one quiet sample must NOT scale down; the
    # second consecutive one must. A mid-range sample resets the count.
    samples = iter([(90, 10), (90, 10),
                    (10, 10),            # quiet 1 -> no change
                    (60, 10),            # mid-range -> resets hysteresis
                    (10, 10), (10, 10),  # quiet 1, 2 -> scale down
                    ])
    s = AutoScaler(_cfg(scale_down_samples=2),
                   resize=lambda n: sizes.append(n) or n,
                   sample_fn=lambda: next(samples))
    for _ in range(6):
        s.step()
    assert sizes == [2, 3, 2]
    assert s.instances == 2
    assert s.stats["scale_downs"] == 1


def test_scale_down_clamps_at_min():
    s = AutoScaler(_cfg(min_instances=1, scale_down_samples=1),
                   resize=lambda n: n, sample_fn=lambda: (1.0, 1.0),
                   initial_instances=1)
    for _ in range(4):
        s.step()
    assert s.instances == 1
    assert s.stats["scale_downs"] == 0  # never below min


def test_resize_callback_failure_keeps_size_and_loop_alive():
    def bad(n):
        raise RuntimeError("pool broken")

    s = AutoScaler(_cfg(), resize=bad, sample_fn=lambda: (99.0, 99.0))
    assert s.step() == 1  # unchanged
    assert s.instances == 1 and s.stats["scale_ups"] == 0


def test_resize_return_value_overrides_recorded_size():
    # pool clamps harder than the scaler (e.g. worker floor) — the
    # scaler must record the pool's answer, not its own desire
    s = AutoScaler(_cfg(), resize=lambda n: 1,
                   sample_fn=lambda: (99.0, 10.0))
    s.step()
    assert s.instances == 1


def test_background_thread_lifecycle():
    hits = []
    s = AutoScaler(_cfg(interval_seconds=0.01),
                   resize=lambda n: n,
                   sample_fn=lambda: hits.append(1) or (10.0, 10.0))
    s.start()
    deadline = time.monotonic() + 3
    while len(hits) < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    s.close()
    assert len(hits) >= 3


def test_autoscaler_disabled_config_never_starts():
    s = AutoScaler(_cfg(auto_scale=False), resize=lambda n: n,
                   sample_fn=lambda: (99.0, 99.0))
    s.start()
    assert s._thread is None


def test_scaling_config_validation():
    with pytest.raises(ValueError):
        ScalingConfig(min_instances=0).validate()
    with pytest.raises(ValueError):
        ScalingConfig(min_instances=3, max_instances=2).validate()
    with pytest.raises(ValueError):
        ScalingConfig(cpu_threshold=0).validate()
    ScalingConfig().validate()


def test_scaling_parses_from_reference_production_block():
    cfg = SystemConfig.from_dict({
        "production": {"scaling": {"auto_scale": True, "min_instances": 2,
                                   "max_instances": 6, "cpu_threshold": 70,
                                   "memory_threshold": 75}},
    })
    assert cfg.scaling.auto_scale is True
    assert cfg.scaling.min_instances == 2
    assert cfg.scaling.max_instances == 6
    assert cfg.scaling.cpu_threshold == 70
    # round trip: to_dict -> from_dict preserves the block
    again = SystemConfig.from_dict(cfg.to_dict())
    assert again.scaling.max_instances == 6


def test_worker_pool_resizes_and_serves(tiny_config):
    """set_worker_count grows/shrinks the queue-draining pool, and a
    multi-worker pool still serves every queued request exactly once."""
    import numpy as np

    from iqc_tpu.serving.app import QualityControlSystem

    sys_ = QualityControlSystem(config=tiny_config)
    assert sys_.initialize_models()
    sys_.start_processing_worker()
    try:
        assert sys_.worker_count == 1
        assert sys_.set_worker_count(3) == 3
        deadline = time.monotonic() + 2
        while sys_.worker_count != 3 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sys_.worker_count == 3

        rng = np.random.default_rng(0)
        # warm the batch predict path once so the parallel workers hit the
        # in-process compile cache instead of racing three first-compiles
        warm = rng.integers(0, 255, (64, 64, 3), dtype="uint8")
        sys_.predict_batch([warm, warm])

        n = 6
        for i in range(n):
            img = rng.integers(0, 255, (64, 64, 3), dtype="uint8")
            sys_.processing_queue.put({"image": img, "request_id": i})
        got = {}
        deadline = time.monotonic() + 120
        while len(got) < n and time.monotonic() < deadline:
            try:
                res = sys_.results_queue.get(timeout=1.0)
            except Exception:
                continue
            got[res["request_id"]] = res
        assert sorted(got) == list(range(n))
        assert all("error" not in r for r in got.values())

        # shrink: extra workers retire at their next poll
        sys_.set_worker_count(1)
        deadline = time.monotonic() + 3
        while sys_.worker_count != 1 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert sys_.worker_count == 1
    finally:
        sys_.stop_processing_worker()


def test_autoscaler_wired_into_system(tiny_config):
    """auto_scale: true starts the scaler against the real worker pool."""
    from iqc_tpu.serving.app import QualityControlSystem

    cfg = tiny_config.update({"production": {"scaling": {
        "auto_scale": True, "min_instances": 2, "max_instances": 4,
        "interval_seconds": 30}}})
    sys_ = QualityControlSystem(config=cfg)
    assert sys_.initialize_models()
    sys_.start_processing_worker()
    try:
        assert sys_.autoscaler is not None
        deadline = time.monotonic() + 2
        while sys_.worker_count != 2 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sys_.worker_count == 2  # started at min_instances
        # a hot sample scales the REAL pool up through the callback
        sys_.autoscaler._sample = lambda: (99.0, 99.0)
        assert sys_.autoscaler.step() == 3
        deadline = time.monotonic() + 2
        while sys_.worker_count != 3 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sys_.worker_count == 3
    finally:
        sys_.stop_processing_worker()


def test_metrics_expose_worker_pool(tiny_config):
    from iqc_tpu.serving.app import QualityControlSystem
    from iqc_tpu.serving.metrics import render_metrics

    sys_ = QualityControlSystem(config=tiny_config)
    assert sys_.initialize_models()
    sys_.start_processing_worker()
    try:
        text = render_metrics(sys_)
        assert "iqc_worker_instances 1" in text
    finally:
        sys_.stop_processing_worker()
