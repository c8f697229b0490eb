import logging

import numpy as np

from iqc_tpu.utils import StageTimes, configure_logging, stage_timer
from iqc_tpu.utils.logging_config import configure_from_config
from iqc_tpu.utils.tracing import profile_trace


def test_stage_timer_accumulates():
    st = StageTimes()
    with stage_timer(st, "a"):
        x = sum(range(1000))
    with stage_timer(st, "a"):
        pass
    with stage_timer(st, "b"):
        pass
    d = st.as_dict()
    assert set(d) == {"a", "b"}
    assert d["a"] >= 0


def test_configure_logging_component_levels():
    configure_logging(level="WARNING", component_levels={"spc": "DEBUG"})
    assert logging.getLogger("iqc_tpu.analytics.spc").level == logging.DEBUG
    assert logging.getLogger().level == logging.WARNING
    configure_logging(level="INFO")  # restore


def test_configure_from_reference_shaped_block(tmp_path):
    configure_from_config(
        {
            "logging": {
                "level": "INFO",
                "file_path": str(tmp_path / "logs" / "qc.log"),
                "loggers": {"models": "ERROR"},
            }
        }
    )
    assert logging.getLogger("iqc_tpu.models").level == logging.ERROR
    logging.getLogger("iqc_tpu.test").info("hello file")
    assert (tmp_path / "logs" / "qc.log").exists()
    configure_logging(level="INFO", file_path=None)  # restore


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        assert True


def test_profile_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # jax profiler writes a plugins/profile dir
    assert any((tmp_path / "trace").rglob("*")), "trace directory is empty"
