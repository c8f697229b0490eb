import pytest

from iqc_tpu.config import SystemConfig, load_config


def test_defaults_match_reference():
    cfg = SystemConfig().validate()
    # config/config.yaml:4-17
    assert cfg.model.confidence_threshold == 0.7
    assert cfg.model.nms_threshold == 0.5
    assert cfg.model.num_classes == 5
    assert cfg.model.ensemble_weights == {"yolo": 0.6, "resnet": 0.4}
    # config/config.yaml:20-32
    assert cfg.processing.batch_size == 8
    assert cfg.processing.input_size == (640, 640)
    # config/config.yaml:47-54 (postprocess defaults, postprocess.py:545-551)
    assert cfg.quality_control.thresholds.critical_defect_limit == 0
    assert cfg.quality_control.thresholds.major_defect_limit == 1
    assert cfg.quality_control.thresholds.minor_defect_limit == 3
    assert cfg.spc.window_size == 100
    assert len(cfg.quality_control.defect_classes) == 5


def test_from_dict_nested_reference_shape():
    cfg = SystemConfig.from_dict(
        {
            "model": {"confidence_threshold": 0.8, "ensemble_weights": {"yolo": 0.7, "resnet": 0.3}},
            "processing": {"preprocessing": {"denoise": True, "resize": [320, 320]}},
            "quality_control": {"thresholds": {"major_defect_limit": 2}},
            "spc": {"specification_limits": {"defect_rate": {"upper": 4.0}}},
            "api": {"rate_limiting": {"enabled": False, "requests_per_minute": 10}},
            "integrations": {"mes": {"enabled": False}},
        }
    )
    assert cfg.model.confidence_threshold == 0.8
    assert cfg.processing.preprocessing.denoise is True
    assert cfg.processing.preprocessing.resize == (320, 320)
    assert cfg.quality_control.thresholds.major_defect_limit == 2
    assert cfg.spc.defect_rate_limits.upper == 4.0
    assert cfg.api.rate_limit_enabled is False
    assert cfg.extra["integrations"]["mes"]["enabled"] is False


def test_update_roundtrip():
    cfg = SystemConfig().validate()
    cfg2 = cfg.update({"model": {"confidence_threshold": 0.9}})
    assert cfg2.model.confidence_threshold == 0.9
    assert cfg.model.confidence_threshold == 0.7  # immutable update


def test_validation_errors():
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"model": {"confidence_threshold": 1.5}})
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"processing": {"input_size": [100, 100]}})
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"edge": {"precision": "fp8"}})


def test_load_missing_file_falls_back(tmp_path):
    cfg = load_config(str(tmp_path / "nope.yaml"))
    assert cfg.model.num_classes == 5


def test_load_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  confidence_threshold: 0.65\n")
    assert load_config(str(p)).model.confidence_threshold == 0.65
