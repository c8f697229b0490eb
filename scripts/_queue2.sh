#!/bin/bash
# Round-3 TPU measurement queue (serial — one TPU process at a time).
set -x
cd /root/repo

echo "=== 1. improved MVTec cycle (crop classifier + mosaic detection) ==="
timeout 5000 python scripts/train_mvtec.py > /tmp/mvtec_cycle2.out 2>/tmp/mvtec_cycle2.err
echo "mvtec2 rc=$?"
sleep 70

echo "=== 2. 128px crop classifier train ==="
CROP_SIZE=128 N_IMAGES=1500 EPOCHS=12 OUT=models/resnet50_qc_128.msgpack \
  timeout 3000 python scripts/train_demo_resnet.py > /tmp/cls128.out 2>/tmp/cls128.err
echo "cls128 rc=$?"
sleep 70

echo "=== 3. bench: 128px crops ==="
BENCH_CLS_INPUT=128 timeout 2400 python bench.py > /tmp/bench_cls128.json 2>/tmp/bench_cls128.err
echo "bench128 rc=$?"
sleep 70

echo "=== 4. bench: int8 YOLO ==="
BENCH_YOLO_INT8=1 timeout 2400 python bench.py > /tmp/bench_yint8.json 2>/tmp/bench_yint8.err
echo "benchyint8 rc=$?"
sleep 70

echo "=== 5. int8 YOLO mAP (shipped checkpoint) ==="
INT8=1 CKPT=models/yolov8n_qc_synthetic.msgpack SPLITS=64,128 \
  timeout 2400 python scripts/eval_yolo.py > /tmp/eval_yint8.json 2>/tmp/eval_yint8.err
echo "evalyint8 rc=$?"
sleep 70

echo "=== 6. bench: everything (int8 classifier + int8 YOLO + 128px crops) ==="
BENCH_PRECISION=int8 BENCH_YOLO_INT8=1 BENCH_CLS_INPUT=128 \
  timeout 2400 python bench.py > /tmp/bench_max.json 2>/tmp/bench_max.err
echo "benchmax rc=$?"
echo "=== queue2 done ==="
