import os

import numpy as np
import pytest

from iqc_tpu.data.mvtec import (
    MVTecClassificationDataset,
    MVTecDetectionDataset,
    mask_to_boxes,
)


@pytest.fixture(scope="module")
def mvtec_tree(tmp_path_factory):
    """Synthesize a mini MVTec-AD category tree."""
    from PIL import Image

    root = tmp_path_factory.mktemp("mvtec") / "metal_plate"
    rng = np.random.default_rng(0)

    def save(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(arr).save(path)

    # train/good + test/good
    for split in ("train/good", "test/good"):
        for i in range(2):
            save(str(root / split / f"{i:03d}.png"),
                 rng.integers(100, 160, (128, 128, 3), dtype=np.uint8))

    # two defect types with ground-truth masks
    for dt, (cy, cx) in (("scratch", (40, 60)), ("hole", (90, 30))):
        for i in range(2):
            img = rng.integers(100, 160, (128, 128, 3), dtype=np.uint8)
            mask = np.zeros((128, 128), np.uint8)
            mask[cy : cy + 20, cx : cx + 30] = 255
            save(str(root / "test" / dt / f"{i:03d}.png"), img)
            save(str(root / "ground_truth" / dt / f"{i:03d}_mask.png"), mask)
    return str(root)


def test_mask_to_boxes():
    mask = np.zeros((64, 64), np.uint8)
    mask[10:20, 10:30] = 255
    mask[40:50, 40:50] = 255
    mask[0, 0] = 255  # below min_area
    boxes = mask_to_boxes(mask)
    assert (10, 10, 30, 20) in boxes
    assert (40, 40, 50, 50) in boxes
    assert len(boxes) == 2


def test_detection_dataset(mvtec_tree):
    ds = MVTecDetectionDataset(mvtec_tree, image_size=256, max_boxes=4)
    assert ds.class_names == ["hole", "scratch"]
    assert len(ds) == 6  # 4 defect + 2 good
    img, boxes, classes, valid = ds.load(0)
    assert img.shape == (256, 256, 3)
    assert valid[0] and not valid[1]
    # box scaled 128 -> 256 (x2)
    x1, y1, x2, y2 = boxes[0]
    assert x2 - x1 == pytest.approx(60, abs=3)
    assert y2 - y1 == pytest.approx(40, abs=3)
    # good sample has no boxes
    good = [i for i, (_, m, c) in enumerate(ds.samples) if c == -1][0]
    _, _, _, v = ds.load(good)
    assert not v.any()


def test_detection_dataset_feeds_loader(mvtec_tree):
    from iqc_tpu.data.yolo_dataset import DetectionLoader

    ds = MVTecDetectionDataset(mvtec_tree, image_size=128, max_boxes=4)
    loader = DetectionLoader(ds, batch_size=2, mosaic_prob=0.5, seed=0)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 128, 128, 3)
    assert batch["boxes"].shape == (2, 4, 4)


def test_classification_dataset(mvtec_tree):
    ds = MVTecClassificationDataset(mvtec_tree, image_size=(64, 64))
    assert ds.class_names == ["good", "hole", "scratch"]
    assert len(ds) == 6
    img, label = ds.load(0)
    assert img.shape == (64, 64, 3)
    assert 0 <= label < 3
    assert ds.class_counts().sum() == 6

    no_good = MVTecClassificationDataset(mvtec_tree, good_label=None)
    assert no_good.class_names == ["hole", "scratch"]
    assert len(no_good) == 4


def test_missing_split_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        MVTecDetectionDataset(str(tmp_path))


# -- held-out-generator corpus renderer (mvtec_synth) + subset splitting ----


@pytest.fixture(scope="module")
def synth_corpus(tmp_path_factory):
    from iqc_tpu.data.mvtec_synth import write_corpus

    root = str(tmp_path_factory.mktemp("mvtec_synth"))
    manifest = write_corpus(
        root, "metal_plate", n_train_good=2, n_test_good=2,
        n_test_per_defect=2, size=128, seed=11,
    )
    return root, manifest


def test_renderer_deterministic():
    from iqc_tpu.data.mvtec_synth import MVTecStyleRenderer

    r1 = MVTecStyleRenderer(size=96, seed=5)
    r2 = MVTecStyleRenderer(size=96, seed=5)
    for dt in ("crack", None):
        a_img, a_mask = r1.render(dt, 3)
        b_img, b_mask = r2.render(dt, 3)
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_mask, b_mask)
    c_img, _ = MVTecStyleRenderer(size=96, seed=6).render("crack", 3)
    assert not np.array_equal(a_img, c_img)  # seed changes the sample


def test_renderer_defects_have_masks():
    from iqc_tpu.data.mvtec_synth import DEFECT_TYPES, MVTecStyleRenderer

    r = MVTecStyleRenderer(size=128, seed=9)
    for i, dt in enumerate(DEFECT_TYPES):
        img, mask = r.render(dt, i)
        assert img.dtype == np.uint8 and img.shape == (128, 128, 3)
        assert (mask > 0).sum() > 10, dt  # a visible defect exists
    _, good_mask = r.render(None, 0)
    assert (good_mask > 0).sum() == 0


def test_synth_corpus_imports_through_mvtec(synth_corpus):
    """The rendered tree must be a valid MVTec-AD layout: boxes re-derived
    from masks by the importer's connected-components pass."""
    from iqc_tpu.config import DEFECT_CLASSES

    root, manifest = synth_corpus
    cat = os.path.join(root, "metal_plate")
    assert manifest["counts"]["train/good"] == 2
    ds = MVTecDetectionDataset(cat, image_size=96, max_boxes=8,
                               class_names=list(DEFECT_CLASSES))
    assert len(ds) == 2 + 2 * 5  # test/good + 5 defect types
    total_boxes = sum(int(ds.load(i)[3].sum()) for i in range(len(ds)))
    assert total_boxes > 0
    cds = MVTecClassificationDataset(cat, (64, 64), good_label=None)
    assert sorted(cds.class_names) == sorted(DEFECT_CLASSES)


def test_subset_dataset_and_split(synth_corpus):
    from iqc_tpu.data.mvtec import SubsetDataset, split_indices

    root, _ = synth_corpus
    ds = MVTecDetectionDataset(os.path.join(root, "metal_plate"),
                               image_size=96, max_boxes=8)
    tr, va = split_indices(len(ds), val_fraction=0.25, seed=0)
    assert sorted(tr + va) == list(range(len(ds)))
    assert len(va) == max(1, round(len(ds) * 0.25))
    tr2, va2 = split_indices(len(ds), val_fraction=0.25, seed=0)
    assert tr == tr2 and va == va2  # deterministic
    sub = SubsetDataset(ds, va)
    assert len(sub) == len(va)
    img, boxes, classes, valid = sub.load(0)
    ref = ds.load(va[0])
    np.testing.assert_array_equal(img, ref[0])
    assert sub.image_size == ds.image_size


def test_crop_classification_dataset(mvtec_tree):
    """One sample per defect REGION, cropped around the mask bbox with
    margin and resized — the distribution the serving ensemble feeds the
    per-crop classifier (whole-image resize hides small defects)."""
    from iqc_tpu.data.mvtec import MVTecCropClassificationDataset

    ds = MVTecCropClassificationDataset(
        mvtec_tree, (64, 64), class_names=["hole", "scratch"],
    )
    # 2 defect types x 2 images x 1 region each
    assert len(ds) == 4
    assert ds.class_counts().tolist() == [2, 2]
    img, label = ds.load(0)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert label in (0, 1)
    # margin: the crop region is padded beyond the 30x20 mask bbox and
    # clamped to the image; min_crop floors tiny regions
    ds_small = MVTecCropClassificationDataset(
        mvtec_tree, (64, 64), margin=0.0, min_crop=128,
        class_names=["hole", "scratch"],
    )
    img2, _ = ds_small.load(0)
    assert img2.shape == (64, 64, 3)


def test_crop_classification_rejects_unknown_folders(mvtec_tree):
    """Folders outside class_names must raise, not silently map to label 0
    (a real MVTec category with class_names=DEFECT_CLASSES would otherwise
    train on 100% mislabeled crops)."""
    from iqc_tpu.data.mvtec import MVTecCropClassificationDataset

    with pytest.raises(ValueError, match="not in class_names"):
        MVTecCropClassificationDataset(
            mvtec_tree, (32, 32), class_names=["crack", "dent"],
        )
    # class_names=None derives labels from the folders
    ds = MVTecCropClassificationDataset(mvtec_tree, (32, 32))
    assert ds.class_names == ["hole", "scratch"]


def test_grouped_split_no_source_image_leakage(mvtec_tree):
    """split_indices_grouped keeps every crop of one source image on one
    side — per-sample splits leak near-duplicate crops across train/val."""
    from iqc_tpu.data.mvtec import (
        MVTecCropClassificationDataset,
        split_indices_grouped,
    )

    ds = MVTecCropClassificationDataset(
        mvtec_tree, (32, 32), class_names=["hole", "scratch"],
    )
    train_idx, val_idx = split_indices_grouped(ds.groups, val_fraction=0.25,
                                               seed=0)
    assert len(train_idx) + len(val_idx) == len(ds)
    train_groups = {ds.groups[i] for i in train_idx}
    val_groups = {ds.groups[i] for i in val_idx}
    assert not (train_groups & val_groups)
    # synthetic check at scale: 10 groups x 3 crops
    groups = [f"img{i}" for i in range(10) for _ in range(3)]
    tr, va = split_indices_grouped(groups, val_fraction=0.3, seed=1)
    assert len(tr) + len(va) == 30
    assert not ({groups[i] for i in tr} & {groups[i] for i in va})
    assert len({groups[i] for i in va}) == 3  # 30% of 10 groups


def test_crop_classification_custom_class_order(mvtec_tree):
    from iqc_tpu.data.mvtec import MVTecCropClassificationDataset

    ds = MVTecCropClassificationDataset(
        mvtec_tree, (32, 32), class_names=["scratch", "hole"],
    )
    by_name = {}
    for i, (_p, _b, label) in enumerate(ds.samples):
        by_name.setdefault(label, _p)
    # scratch folder maps to id 0 under the custom order
    assert any("scratch" in p for l, p in by_name.items() if l == 0)
    assert any("hole" in p for l, p in by_name.items() if l == 1)


def test_concat_dataset(synth_corpus):
    """ConcatDataset (train_mvtec.py EXTRA_N): samples pass through with
    offsets, attrs/labels/groups propagate, val split stays untouched."""
    from iqc_tpu.data.mvtec import ConcatDataset, SubsetDataset, split_indices

    root, _ = synth_corpus
    ds = MVTecDetectionDataset(os.path.join(root, "metal_plate"),
                               image_size=96, max_boxes=8)
    tr, va = split_indices(len(ds), val_fraction=0.25, seed=0)
    train, val = SubsetDataset(ds, tr), SubsetDataset(ds, va)
    cat = ConcatDataset([train, val])  # stand-in "extra" corpus
    assert len(cat) == len(train) + len(val)
    for probe in (0, len(train) - 1, len(train), len(cat) - 1):
        src = (train.load(probe) if probe < len(train)
               else val.load(probe - len(train)))
        got = cat.load(probe)
        np.testing.assert_array_equal(got[0], src[0])
        np.testing.assert_array_equal(got[1], src[1])
    assert cat.image_size == ds.image_size
    assert cat.max_boxes == ds.max_boxes


def test_synthetic_dataset_density_knobs():
    """min/max_defects: defaults keep the historical RNG stream (corpora
    bit-identical); dense settings crowd every image."""
    from iqc_tpu.data.yolo_dataset import SyntheticDefectDataset

    base = SyntheticDefectDataset(n=6, image_size=96, max_boxes=8, seed=5)
    dflt = SyntheticDefectDataset(n=6, image_size=96, max_boxes=8, seed=5,
                                  min_defects=0, max_defects=3)
    for i in range(6):
        a, b = base.load(i), dflt.load(i)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[3], b[3])

    dense = SyntheticDefectDataset(n=6, image_size=96, max_boxes=16, seed=5,
                                   min_defects=8, max_defects=12)
    counts = [dense.load(i)[3].sum() for i in range(6)]
    # some renders drop sub-3px boxes, so allow slack below min_defects
    assert min(counts) >= 6 and max(counts) <= 12

    capped = SyntheticDefectDataset(n=3, image_size=96, max_boxes=4, seed=5,
                                    min_defects=8, max_defects=12)
    for i in range(3):
        assert capped.load(i)[3].sum() <= 4  # never writes past max_boxes
