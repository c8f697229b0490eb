import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iqc_tpu.ops.jit_utils import hoisted_jit


def test_hoisted_jit_matches_jit():
    const = jnp.asarray(np.random.default_rng(0).normal(0, 1, (16, 16)), jnp.float32)

    def fn(x):
        return jnp.tanh(x @ const) + jnp.asarray([1.0, 2.0] * 8)

    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (4, 16)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hoisted_jit(fn)(x)), np.asarray(jax.jit(fn)(x)), rtol=1e-6
    )


def test_hoisted_jit_pytree_io():
    mean = jnp.asarray([0.485, 0.456, 0.406])

    def fn(batch):
        return {"norm": batch["img"] - mean, "sum": jnp.sum(batch["img"])}

    batch = {"img": jnp.ones((2, 4, 4, 3))}
    out = hoisted_jit(fn)(batch)
    assert set(out) == {"norm", "sum"}
    assert out["norm"].shape == (2, 4, 4, 3)
    np.testing.assert_allclose(float(out["sum"]), 96.0)


def test_hoisted_jit_multiple_signatures():
    f = hoisted_jit(lambda x: x * jnp.asarray([2.0]))
    a = f(jnp.ones((3,)))
    b = f(jnp.ones((5,)))
    assert a.shape == (3,) and b.shape == (5,)
    assert len(f._cache) == 2
    # repeated call reuses cache
    f(jnp.ones((3,)))
    assert len(f._cache) == 2


def test_hoisted_jit_no_consts():
    f = hoisted_jit(lambda x: x + 1.0)
    np.testing.assert_allclose(np.asarray(f(jnp.zeros((2,)))), [1.0, 1.0])


def test_hoisted_jit_kwargs_and_scalars():
    def fn(x, scale):
        return x * scale

    f = hoisted_jit(fn)
    out = f(jnp.ones((2,)), jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(out), [3.0, 3.0])


def test_hoisted_jit_decorator_form():
    @hoisted_jit
    def fn(x):
        return x - jnp.asarray([1.0, 1.0])

    np.testing.assert_allclose(np.asarray(fn(jnp.zeros((2,)))), [-1.0, -1.0])
