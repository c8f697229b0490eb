import threading
import time

import numpy as np
import pytest

from iqc_tpu.runtime import BatchQueue, LatencyHistogram, NativeRateLimiter, native_available


def test_native_library_builds():
    """The C++ runtime must actually build in this environment."""
    assert native_available()


def test_batch_queue_aggregates():
    q = BatchQueue(capacity=64)
    for i in range(10):
        assert q.push(i)
    batch = q.pop_batch(max_batch=8, timeout_ms=50)
    assert batch == list(range(8))
    assert q.qsize() == 2
    rest = q.pop_batch(max_batch=8, timeout_ms=50)
    assert rest == [8, 9]


def test_batch_queue_timeout_empty():
    q = BatchQueue(capacity=4)
    t0 = time.perf_counter()
    assert q.pop_batch(4, timeout_ms=50) == []
    assert time.perf_counter() - t0 < 1.0


def test_batch_queue_backpressure():
    q = BatchQueue(capacity=2)
    assert q.push(1) and q.push(2)
    assert not q.push(3)  # full -> reject, no silent drop


def test_batch_queue_concurrent_producers():
    q = BatchQueue(capacity=4096)
    n_threads, per_thread = 8, 100

    def producer(base):
        for i in range(per_thread):
            q.push(base * 1000 + i)

    threads = [threading.Thread(target=producer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    got = []
    while True:
        batch = q.pop_batch(64, timeout_ms=20)
        if not batch:
            break
        got.extend(batch)
    assert len(got) == n_threads * per_thread
    assert len(set(got)) == len(got)  # no dup, no loss


def test_rate_limiter():
    rl = NativeRateLimiter(max_requests=5, window_s=60)
    assert all(rl.allow("a") for _ in range(5))
    assert not rl.allow("a")
    assert rl.allow("b")


def test_rate_limiter_window_expiry():
    rl = NativeRateLimiter(max_requests=2, window_s=0.2)
    assert rl.allow("x") and rl.allow("x")
    assert not rl.allow("x")
    time.sleep(0.25)
    assert rl.allow("x")


def test_latency_histogram_percentiles():
    h = LatencyHistogram()
    for ms in np.linspace(1, 100, 1000):
        h.record(float(ms))
    assert h.count() == 1000
    assert h.mean() == pytest.approx(50.5, rel=0.1)
    # log-binned estimates within ~6% of the true quantiles
    assert h.percentile(50) == pytest.approx(50.5, rel=0.1)
    assert h.percentile(95) == pytest.approx(95.0, rel=0.1)
    assert h.percentile(99) == pytest.approx(99.0, rel=0.1)


def test_latency_histogram_concurrent():
    h = LatencyHistogram()

    def rec():
        for _ in range(1000):
            h.record(10.0)

    threads = [threading.Thread(target=rec) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert h.count() == 4000
    assert h.summary()["p50_ms"] == pytest.approx(10.0, rel=0.1)


def test_native_jpeg_decode_matches_pil():
    """libjpeg decode parity with PIL (IFAST DCT: <=1 LSB on real content)
    + DCT-domain downscale toward a target size."""
    import io

    import numpy as np
    from PIL import Image

    from iqc_tpu.runtime.native import decode_jpeg, native_available

    if not native_available():
        import pytest

        pytest.skip("native runtime unavailable")
    yy, xx = np.mgrid[:512, :512]
    img = np.stack([(120 + 40 * np.sin(xx / 50) + 30 * np.cos(yy / 40))
                    .astype(np.uint8)] * 3, -1)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()

    full = decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert full.shape == pil.shape
    assert np.abs(full.astype(int) - pil.astype(int)).max() <= 2

    # scaled decode: min dim 512 -> target 128 admits scale 4 => 128px
    small = decode_jpeg(data, target=128)
    assert small.shape == (128, 128, 3)

    # non-JPEG bytes -> None (caller falls back to PIL)
    assert decode_jpeg(b"not a jpeg") is None
