"""keras_import unit tests against hand-built Keras-format H5 files
(synthesized with h5py in the exact layout Keras writes: model_config attr +
model_weights/<layer>/<layer>/...), so the importer's layer handling is
pinned without a TF dependency.  Golden parity against *real* tf.keras saves
lives in tests/test_tf_golden.py."""

import json

import h5py
import numpy as np
import pytest

from ecseg_tpu.models.keras_import import (
    import_keras_h5,
    load_npz_pytree,
    save_npz_pytree,
)


def _sequential_h5(path, rng):
    w1 = rng.standard_normal((3, 3, 1, 4)).astype(np.float32)
    b1 = rng.standard_normal(4).astype(np.float32)
    w2 = rng.standard_normal((3, 3, 4, 2)).astype(np.float32)
    b2 = rng.standard_normal(2).astype(np.float32)
    config = {
        "class_name": "Sequential",
        "config": {
            "name": "seq",
            "layers": [
                {"class_name": "InputLayer", "config": {"name": "in0"}},
                {
                    "class_name": "Conv2D",
                    "config": {
                        "name": "c1", "filters": 4, "kernel_size": [3, 3],
                        "strides": [1, 1], "padding": "same",
                        "activation": "relu", "use_bias": True,
                    },
                },
                {
                    "class_name": "MaxPooling2D",
                    "config": {
                        "name": "p1", "pool_size": [2, 2], "strides": [2, 2],
                        "padding": "same",
                    },
                },
                {
                    "class_name": "Conv2D",
                    "config": {
                        "name": "c2", "filters": 2, "kernel_size": [3, 3],
                        "strides": [1, 1], "padding": "same",
                        "activation": "softmax", "use_bias": True,
                    },
                },
            ],
        },
    }
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(config)
        mw = f.create_group("model_weights")
        for name, (w, b) in {"c1": (w1, b1), "c2": (w2, b2)}.items():
            g = mw.create_group(name).create_group(name)
            g.create_dataset("kernel:0", data=w)
            g.create_dataset("bias:0", data=b)
            mw[name].attrs["weight_names"] = [
                f"{name}/kernel:0".encode(), f"{name}/bias:0".encode()
            ]
    return (w1, b1, w2, b2)


def test_import_sequential(tmp_path, rng):
    import jax.numpy as jnp

    path = str(tmp_path / "model.h5")
    w1, b1, w2, b2 = _sequential_h5(path, rng)
    model = import_keras_h5(path)

    x = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    out = model.predict_on_batch(x)
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)

    # manual reference
    from ecseg_tpu.models.layers import conv2d, max_pool

    h = np.maximum(np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1))), 0)
    h = np.asarray(max_pool(jnp.asarray(h)))
    logits = np.asarray(conv2d(jnp.asarray(h), jnp.asarray(w2), jnp.asarray(b2)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_import_functional_with_concat(tmp_path, rng):
    w = rng.standard_normal((1, 1, 2, 3)).astype(np.float32)
    config = {
        "class_name": "Functional",
        "config": {
            "name": "f",
            "layers": [
                {"class_name": "InputLayer", "config": {"name": "inp"},
                 "inbound_nodes": []},
                {"class_name": "Concatenate",
                 "config": {"name": "cat", "axis": -1},
                 "inbound_nodes": [[["inp", 0, 0, {}], ["inp", 0, 0, {}]]]},
                {"class_name": "Conv2D",
                 "config": {"name": "c", "filters": 3, "kernel_size": [1, 1],
                            "strides": [1, 1], "padding": "same",
                            "activation": "linear", "use_bias": False},
                 "inbound_nodes": [[["cat", 0, 0, {}]]]},
            ],
            "input_layers": [["inp", 0, 0]],
            "output_layers": [["c", 0, 0]],
        },
    }
    path = str(tmp_path / "f.h5")
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(config)
        g = f.create_group("model_weights").create_group("c").create_group("c")
        g.create_dataset("kernel:0", data=w)
        f["model_weights"]["c"].attrs["weight_names"] = [b"c/kernel:0"]
    model = import_keras_h5(path)
    x = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    out = model.predict_on_batch(x)
    xx = np.concatenate([x, x], axis=-1)
    ref = np.einsum("nhwc,co->nhwo", xx, w[0, 0])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_npz_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp

    params = {"a": {"kernel": np.ones((2, 2)), "bias": np.zeros(3)}, "b": np.arange(4)}
    p = str(tmp_path / "p.npz")
    save_npz_pytree(p, params)
    back = load_npz_pytree(p)
    np.testing.assert_array_equal(np.asarray(back["a"]["kernel"]), params["a"]["kernel"])
    np.testing.assert_array_equal(np.asarray(back["b"]), params["b"])
