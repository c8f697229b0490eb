import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from prepare_models import convert_torch_resnet50  # noqa: E402


def synth_torch_resnet50_state(num_classes=5, with_head=True):
    """Random state_dict with torchvision resnet50 names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(1, 0.1, c)).astype(np.float32)

    sd["conv1.weight"] = rng.normal(0, 0.1, (64, 3, 7, 7)).astype(np.float32)
    bn("bn1", 64)
    stage_sizes = (3, 4, 6, 3)
    in_c = 64
    for i, n in enumerate(stage_sizes):
        width = 64 * 2**i
        out_c = width * 4
        for j in range(n):
            p = f"layer{i + 1}.{j}"
            c_in = in_c if j == 0 else out_c
            sd[f"{p}.conv1.weight"] = rng.normal(0, 0.1, (width, c_in, 1, 1)).astype(np.float32)
            bn(f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = rng.normal(0, 0.1, (width, width, 3, 3)).astype(np.float32)
            bn(f"{p}.bn2", width)
            sd[f"{p}.conv3.weight"] = rng.normal(0, 0.1, (out_c, width, 1, 1)).astype(np.float32)
            bn(f"{p}.bn3", out_c)
            if j == 0:
                sd[f"{p}.downsample.0.weight"] = rng.normal(
                    0, 0.1, (out_c, c_in, 1, 1)
                ).astype(np.float32)
                bn(f"{p}.downsample.1", out_c)
        in_c = out_c
    if with_head:
        sd["fc.1.weight"] = rng.normal(0, 0.05, (512, 2048)).astype(np.float32)
        sd["fc.1.bias"] = np.zeros(512, np.float32)
        sd["fc.4.weight"] = rng.normal(0, 0.05, (num_classes, 512)).astype(np.float32)
        sd["fc.4.bias"] = np.zeros(num_classes, np.float32)
    return sd


def test_converted_weights_run_forward():
    import jax
    import jax.numpy as jnp

    from iqc_tpu.models.resnet import ResNet50

    sd = synth_torch_resnet50_state()
    converted = convert_torch_resnet50(sd)

    resnet = ResNet50(num_classes=5)
    init = resnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)

    # structure must match the Flax init exactly (tree of params)
    def paths(tree, prefix=()):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, prefix + (k,))
            return out
        return {prefix}

    assert paths(converted["params"]) == paths(init["params"])
    assert paths(converted["batch_stats"]) == paths(init["batch_stats"])

    # shapes line up -> the converted tree runs a real forward pass
    conv_j = jax.tree_util.tree_map(jnp.asarray, converted)
    logits = resnet.apply(conv_j, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False)
    assert logits.shape == (1, 5)
    assert np.isfinite(np.asarray(logits)).all()

    # conv kernel transpose: OIHW -> HWIO
    k = np.asarray(converted["params"]["stem_conv"]["kernel"])
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_array_equal(k[..., 0, 0], sd["conv1.weight"][0, 0])


def test_convert_without_head_keeps_init_head():
    import jax
    import jax.numpy as jnp

    from iqc_tpu.models.resnet import ResNet50

    sd = synth_torch_resnet50_state(with_head=False)
    converted = convert_torch_resnet50(sd)
    assert "head_dense1" not in converted["params"]
