#!/usr/bin/env python3
"""Multi-seed device-mosaic vs host-mosaic A/B study (VERDICT r2 #7).

Round 2 claimed device mosaic trains at near-parity quality with host
mosaic, but on a sample of one seed per arm the difference sat inside run
variance. This driver runs N seeds per arm through the SAME training
entrypoint (scripts/train_demo_yolo.py) against the SAME deterministic val
split, then reports mean±std per arm so the parity claim is statistical.

Each run is a fresh subprocess (clean TPU client); runs are serialized
(one TPU process at a time — CLAUDE.md rule 3).

Run: python scripts/mosaic_ab_study.py  (env: SEEDS, EPOCHS, N_IMAGES,
     IMAGE_SIZE, OUT_JSON)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(seed: int, device_mosaic: bool, epochs: int, n_images: int,
            image_size: int) -> dict:
    out = f"/tmp/ab_mosaic_{'dev' if device_mosaic else 'host'}_{seed}.msgpack"
    env = dict(os.environ)
    env.update({
        "SEED": str(seed),
        "DEVICE_MOSAIC": "1" if device_mosaic else "0",
        "MOSAIC_AA": "0",
        "EPOCHS": str(epochs),
        "N_IMAGES": str(n_images),
        "IMAGE_SIZE": str(image_size),
        "OUT": out,
        # isolate mid-run best saves from the shipped demo checkpoint
        "CKPT_DIR": out.replace(".msgpack", "_ckpt"),
    })
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "train_demo_yolo.py")],
            env=env, capture_output=True, text=True,
            timeout=int(os.environ.get("RUN_TIMEOUT", "3600")), cwd=REPO,
        )
    except subprocess.TimeoutExpired as e:
        # a timed-out seed must not kill the whole study (r4: host-side CPU
        # contention pushed one seed past RUN_TIMEOUT and the uncaught
        # exception dropped the remaining seeds)
        time.sleep(60)  # let the killed TPU client release
        return {"seed": seed, "device_mosaic": device_mosaic,
                "error": f"timeout after {e.timeout}s",
                "wall_s": round(time.time() - t0, 1)}
    wall = time.time() - t0
    if proc.returncode != 0:
        return {"seed": seed, "device_mosaic": device_mosaic, "error":
                proc.stderr[-2000:], "wall_s": round(wall, 1)}
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rep = json.loads(last)
    result = {
        "seed": seed, "device_mosaic": device_mosaic,
        "best_mAP50": rep["best_mAP50"],
        "final": rep.get("final", {}),
        "wall_s": round(wall, 1),
    }
    # deterministic off-train eval on both val splits (the host arm doubles
    # as candidate checkpoints for the mAP50-95>=0.75 target, VERDICT #2)
    time.sleep(30)  # let the TPU client release cleanly
    ev_env = dict(os.environ)
    ev_env.update({"CKPT": out, "SPLITS": "64,128"})
    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_yolo.py")],
        env=ev_env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    if ev.returncode == 0:
        lines = [l for l in ev.stdout.strip().splitlines() if l.startswith("{")]
        if lines:
            result["eval"] = json.loads(lines[-1])["splits"]
    time.sleep(30)
    return result


def main() -> None:
    seeds = [int(s) for s in os.environ.get("SEEDS", "11,23,37,42,59").split(",")]
    epochs = int(os.environ.get("EPOCHS", "60"))
    n_images = int(os.environ.get("N_IMAGES", "768"))
    image_size = int(os.environ.get("IMAGE_SIZE", "320"))
    out_json = os.environ.get("OUT_JSON", "docs/mosaic_ab_r3.json")

    arms = [a.strip() for a in
            os.environ.get("ARMS", "device,host").split(",") if a.strip()]
    arm_flags = [a == "device" for a in arms]
    # per-arm seed override (resume support): SEEDS_DEVICE / SEEDS_HOST
    results = []
    for device_mosaic in arm_flags:
        arm_env = os.environ.get(
            "SEEDS_DEVICE" if device_mosaic else "SEEDS_HOST")
        arm_seeds = ([int(s) for s in arm_env.split(",") if s]
                     if arm_env else seeds)
        for seed in arm_seeds:
            arm = "device" if device_mosaic else "host"
            print(f"[{time.strftime('%H:%M:%S')}] run arm={arm} seed={seed}",
                  flush=True)
            r = run_one(seed, device_mosaic, epochs, n_images, image_size)
            print(json.dumps(r), flush=True)
            results.append(r)
            # checkpoint partial results so an interrupted study is usable
            os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
            with open(out_json, "w") as f:
                json.dump({"seeds": seeds, "epochs": epochs,
                           "n_images": n_images, "image_size": image_size,
                           "runs": results}, f, indent=1)

    import statistics

    summary = {}
    for arm, flag in (("device_mosaic", True), ("host_mosaic", False)):
        vals = [r["best_mAP50"] for r in results
                if r["device_mosaic"] is flag and "best_mAP50" in r]
        if vals:
            summary[arm] = {
                "n": len(vals),
                "mean_best_mAP50": round(statistics.mean(vals), 4),
                "std": round(statistics.stdev(vals) if len(vals) > 1 else 0.0, 4),
                "min": round(min(vals), 4), "max": round(max(vals), 4),
            }
    with open(out_json, "w") as f:
        json.dump({"seeds": seeds, "epochs": epochs, "n_images": n_images,
                   "image_size": image_size, "runs": results,
                   "summary": summary}, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
