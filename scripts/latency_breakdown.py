#!/usr/bin/env python3
"""Per-request serving latency breakdown on the real TPU (VERDICT r1 #6).

Round 1 reported ~460 ms/request warm over HTTP and blamed "the tunnel"
without a measured breakdown. This script measures each stage separately:

  decode       host JPEG decode (PIL)
  preprocess   jitted preprocess dispatch (device-resident output)
  device       fused ensemble+segmentation program: dispatch + bulk fetch
  postprocess  host JSON assembly / rules / SPC
  http         loopback HTTP overhead (request parse, multipart, response)

Run: python scripts/latency_breakdown.py  (one TPU process at a time!)
Prints one JSON object.
"""

import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import numpy as np
    from PIL import Image

    from iqc_tpu.serving.app import QualityControlSystem, create_app

    iters = int(os.environ.get("LAT_ITERS", "15"))

    system = QualityControlSystem()
    assert system.initialize_models(), "model init failed"
    det = system.detector

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=90)
    jpeg = buf.getvalue()

    # warm every compile path first
    det.predict(rgb)
    det.predict(rgb)

    decode_ms, stage_rows, total_ms = [], [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        img = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
        t1 = time.perf_counter()
        result = det.predict(img)
        t2 = time.perf_counter()
        decode_ms.append((t1 - t0) * 1e3)
        total_ms.append((t2 - t1) * 1e3)
        stage_rows.append(result["stage_times_ms"])

    stages = {}
    for key in stage_rows[0]:
        stages[key] = round(statistics.median(r[key] for r in stage_rows), 2)

    # loopback HTTP: full multipart POST /api/detect on the live server
    from iqc_tpu.serving.wsgi import serve

    app = create_app(system, initialize=False)
    server = serve(app, host="127.0.0.1", port=5577, background=True)
    import urllib.request

    boundary = b"lbbound"
    body = (
        b"--" + boundary + b"\r\n"
        b'Content-Disposition: form-data; name="image"; filename="t.jpg"\r\n\r\n'
        + jpeg + b"\r\n--" + boundary + b"--\r\n"
    )
    req = urllib.request.Request(
        "http://127.0.0.1:5577/api/detect", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary.decode()}"},
    )
    urllib.request.urlopen(req).read()  # warm
    http_ms = []
    for _ in range(iters):
        t0 = time.perf_counter()
        urllib.request.urlopen(req).read()
        http_ms.append((time.perf_counter() - t0) * 1e3)
    server.shutdown()

    def pct(xs, q):
        xs = sorted(xs)
        return round(xs[min(int(len(xs) * q / 100), len(xs) - 1)], 2)

    med_total = statistics.median(total_ms)
    med_http = statistics.median(http_ms)
    out = {
        "decode_ms": round(statistics.median(decode_ms), 2),
        "stage_times_ms": stages,
        "predict_total_ms": round(med_total, 2),
        "predict_percentiles_ms": {"p50": pct(total_ms, 50),
                                   "p95": pct(total_ms, 95),
                                   "p99": pct(total_ms, 99)},
        "http_total_ms": round(med_http, 2),
        "http_percentiles_ms": {"p50": pct(http_ms, 50),
                                "p95": pct(http_ms, 95),
                                "p99": pct(http_ms, 99)},
        "http_overhead_ms": round(med_http - med_total - statistics.median(decode_ms), 2),
        "iters": iters,
        "note": "predict_total = preprocess dispatch + fused device program "
                "(dispatch+bulk fetch through the tunnel) + host postprocess",
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
