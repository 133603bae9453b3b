"""Keras-H5 -> JAX weight import.

The reference's metaseg model exists only as a Keras HDF5 blob
(``models/metaseg.h5``, loaded at reference src/utils.py:27-33); its
architecture is not in code anywhere.  This module reconstructs the layer
graph from the H5's embedded ``model_config`` JSON (present in every Keras
H5 save) and executes it as a pure JAX function, so the blob drops into the
TPU pipeline without TensorFlow.

Supported layer types cover the conv-U-Net/classifier families these
pipelines use: InputLayer, Conv2D, Conv2DTranspose, MaxPooling2D,
AveragePooling2D, UpSampling2D, Concatenate, Add, Activation (+fused
activations), BatchNormalization (inference mode), Dropout (no-op),
ZeroPadding2D, Cropping2D, Rescaling, Dense, Flatten,
GlobalAveragePooling2D.

Also provides flat .npz pytree save/load used to cache converted weights.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, conv2d_transpose

# ---------------------------------------------------------------------------
# npz pytree cache
# ---------------------------------------------------------------------------


def save_npz_pytree(path: str, params: Dict) -> None:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_npz_pytree(path: str) -> Dict:
    data = np.load(path)
    out: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return out


# ---------------------------------------------------------------------------
# H5 graph import
# ---------------------------------------------------------------------------

_ACTIVATIONS: Dict[str, Callable] = {
    "linear": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0),
    "sigmoid": jax.nn.sigmoid,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
}


def _decode(v):
    return v.decode() if isinstance(v, bytes) else v


def _layer_weights(h5, layer_name: str) -> List[np.ndarray]:
    """Fetch a layer's weight tensors in Keras order from the H5 file."""
    mw = h5["model_weights"] if "model_weights" in h5 else h5
    if layer_name not in mw:
        return []
    grp = mw[layer_name]
    names = [_decode(n) for n in grp.attrs.get("weight_names", [])]
    if names:
        return [np.array(grp[n]) for n in names]
    # fall back: walk the group
    out = []

    def visit(_, obj):
        import h5py

        if isinstance(obj, h5py.Dataset):
            out.append(np.array(obj))

    grp.visititems(visit)
    return out


class KerasModel:
    """A Keras graph reconstructed as (params pytree, pure forward fn)."""

    def __init__(self, params: Dict, forward: Callable, config: Dict):
        self.params = params
        self._forward = forward
        self.config = config

    def __call__(self, x):
        return self._forward(self.params, x)

    def predict_on_batch(self, x):
        return np.asarray(self._forward(self.params, jnp.asarray(x)))

    predict = predict_on_batch


def _pool2(x, size, stride, padding, op):
    from jax import lax

    init = -jnp.inf if op == "max" else 0.0
    fn = lax.max if op == "max" else lax.add
    y = lax.reduce_window(
        x,
        init,
        fn,
        (1, size[0], size[1], 1),
        (1, stride[0], stride[1], 1),
        padding.upper(),
    )
    if op == "avg":
        ones = jnp.ones_like(x[..., :1])
        cnt = lax.reduce_window(
            ones, 0.0, lax.add, (1, size[0], size[1], 1), (1, stride[0], stride[1], 1),
            padding.upper(),
        )
        y = y / cnt
    return y


def import_keras_h5(path: str) -> KerasModel:
    import h5py

    with h5py.File(path, "r") as h5:
        cfg_raw = h5.attrs.get("model_config")
        if cfg_raw is None:
            raise ValueError(f"{path} has no embedded model_config")
        cfg = json.loads(_decode(cfg_raw))
        model_cfg = cfg["config"]
        class_name = cfg["class_name"]

        layers_cfg = model_cfg["layers"]
        params: Dict[str, Any] = {}
        # steps: (out key (name, node_idx), input refs [(name, node_idx)], fn)
        steps: List[Tuple[Tuple[str, int], List[Tuple[str, int]], Callable]] = []

        if class_name == "Sequential":
            prev = ("__input__", 0)
            inputs = ["__input__"]
            for lc in layers_cfg:
                if lc["class_name"] == "InputLayer":
                    continue
                name = lc["config"]["name"]
                fn = _make_layer_fn(lc, name, h5, params)
                if fn is None:
                    continue
                steps.append(((name, 0), [prev], fn))
                prev = (name, 0)
            outputs = [prev]
        else:  # Functional
            inputs = []
            for lc in layers_cfg:
                name = lc["config"]["name"]
                if lc["class_name"] == "InputLayer":
                    inputs.append(name)
                    continue
                nodes = _inbound_refs(lc)
                fn = _make_layer_fn(lc, name, h5, params)
                if fn is None:  # identity layer (Dropout etc.)
                    fn = lambda p, xs: xs[0]
                # a shared layer is called once per inbound node; every call
                # reuses the same weights but gets its own env slot
                for node_idx, in_refs in enumerate(nodes):
                    steps.append(((name, node_idx), in_refs, fn))
            out_spec = model_cfg.get("output_layers", [])
            if out_spec:
                outputs = [(o[0], o[1] if len(o) > 1 else 0) for o in out_spec]
            else:
                outputs = [steps[-1][0]]

            # The config lists layers in creation order; with shared layers a
            # later-created producer can feed an earlier layer's second call,
            # so execute in dependency order (Kahn) instead.
            available = {(name, 0) for name in inputs}
            ordered, remaining = [], steps
            while remaining:
                rest = []
                for s in remaining:
                    if all(r in available for r in s[1]):
                        ordered.append(s)
                        available.add(s[0])
                    else:
                        rest.append(s)
                if len(rest) == len(remaining):
                    missing = {r for s in remaining for r in s[1]} - available
                    raise ValueError(
                        f"unresolvable layer graph; missing producers: {missing}"
                    )
                remaining = rest
            steps = ordered

    def forward(p, x):
        if len(inputs) == 1:
            env = {(inputs[0], 0): x}
        else:
            env = {(name, 0): xi for name, xi in zip(inputs, x)}
        for (out, ins, fn) in steps:
            env[out] = fn(p, [env[i] for i in ins])
        res = [env[o] for o in outputs]
        return res[0] if len(res) == 1 else res

    return KerasModel(params, forward, cfg)


def _inbound_refs(layer_cfg) -> List[List[Tuple[str, int]]]:
    """All inbound nodes of a layer as [(producer_name, producer_node_idx)]
    lists -- one entry per call of the layer (shared layers have several).
    Handles both the legacy nested-list format and the Keras 3 dict format.
    A producer's node index selects WHICH call of a shared producer feeds
    this layer."""
    out: List[List[Tuple[str, int]]] = []
    for node in layer_cfg.get("inbound_nodes", []):
        if isinstance(node, dict):  # Keras 3 style
            refs: List[Tuple[str, int]] = []

            def walk(a):
                if isinstance(a, dict):
                    hist = a.get("config", {}).get("keras_history")
                    if hist is not None:
                        if len(hist) > 2 and hist[2] not in (0, None):
                            raise NotImplementedError(
                                "multi-output producer tensors not supported"
                            )
                        refs.append((hist[0], hist[1] if len(hist) > 1 else 0))
                        return
                    for v in a.values():
                        walk(v)
                elif isinstance(a, (list, tuple)):
                    for e in a:
                        walk(e)

            walk(node.get("args", []))
            out.append(refs)
        else:  # legacy: [[name, node_idx, tensor_idx, kwargs], ...]
            refs = []
            for entry in node:
                if len(entry) > 2 and entry[2] not in (0, None):
                    raise NotImplementedError(
                        "multi-output producer tensors not supported"
                    )
                refs.append((entry[0], entry[1] if len(entry) > 1 else 0))
            out.append(refs)
    return out


def _make_layer_fn(lc, name, h5, params):
    cls = lc["class_name"]
    c = lc["config"]
    act = _ACTIVATIONS.get(c.get("activation", "linear"), lambda x: x)

    if cls in ("Dropout", "SpatialDropout2D", "GaussianNoise"):
        return None
    if cls == "Activation":
        a = _ACTIVATIONS[c["activation"]]
        return lambda p, xs: a(xs[0])
    if cls in ("ReLU",):
        return lambda p, xs: jnp.maximum(xs[0], 0)
    if cls == "LeakyReLU":
        alpha = c.get("alpha", c.get("negative_slope", 0.3))
        return lambda p, xs: jax.nn.leaky_relu(xs[0], alpha)
    if cls == "Rescaling":
        scale, offset = c["scale"], c.get("offset", 0.0)
        return lambda p, xs: xs[0] * scale + offset
    if cls == "Flatten":
        return lambda p, xs: xs[0].reshape(xs[0].shape[0], -1)
    if cls == "Reshape":
        target = tuple(c["target_shape"])
        return lambda p, xs: xs[0].reshape((xs[0].shape[0],) + target)
    if cls == "Permute":
        dims = tuple(c["dims"])  # 1-indexed, excluding batch
        return lambda p, xs: jnp.transpose(xs[0], (0,) + dims)
    if cls == "GlobalAveragePooling2D":
        return lambda p, xs: jnp.mean(xs[0], axis=(1, 2))
    if cls == "Concatenate":
        axis = c.get("axis", -1)
        return lambda p, xs: jnp.concatenate(xs, axis=axis)
    if cls == "Add":
        return lambda p, xs: sum(xs)
    if cls in ("MaxPooling2D", "AveragePooling2D"):
        size = tuple(c["pool_size"])
        stride = tuple(c["strides"] or size)
        pad = c["padding"]
        op = "max" if cls == "MaxPooling2D" else "avg"
        return lambda p, xs: _pool2(xs[0].astype(jnp.float32), size, stride, pad, op)
    if cls == "UpSampling2D":
        size = tuple(c["size"])
        if c.get("interpolation", "nearest") == "nearest":
            return lambda p, xs: jnp.repeat(
                jnp.repeat(xs[0], size[0], axis=1), size[1], axis=2
            )
        def up_bilinear(p, xs):
            x = xs[0]
            out = (x.shape[1] * size[0], x.shape[2] * size[1])
            import jax.image

            return jax.image.resize(x, (x.shape[0], *out, x.shape[3]), "bilinear")
        return up_bilinear
    if cls == "ZeroPadding2D":
        padding = c["padding"]
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        return lambda p, xs: jnp.pad(
            xs[0], ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0))
        )
    if cls == "Cropping2D":
        cr = c["cropping"]
        (t, b), (l, r) = cr
        return lambda p, xs: xs[0][:, t : xs[0].shape[1] - b, l : xs[0].shape[2] - r, :]
    if cls == "Conv2D":
        w = _layer_weights(h5, name)
        params[name] = {"kernel": jnp.asarray(w[0])}
        use_bias = c.get("use_bias", True) and len(w) > 1
        if use_bias:
            params[name]["bias"] = jnp.asarray(w[1])
        stride = tuple(c["strides"])
        pad = c["padding"].upper()

        def conv_fn(p, xs, _name=name, _act=act, _stride=stride, _pad=pad, _ub=use_bias):
            y = conv2d(
                xs[0].astype(jnp.float32),
                p[_name]["kernel"],
                p[_name]["bias"] if _ub else None,
                stride=_stride[0],
                padding=_pad,
            )
            return _act(y)

        return conv_fn
    if cls == "Conv2DTranspose":
        w = _layer_weights(h5, name)
        # Keras stores transpose-conv kernels as (H, W, out_ch, in_ch):
        # transpose to our HWIO = (H, W, in_ch, out_ch).
        params[name] = {"kernel": jnp.asarray(np.transpose(w[0], (0, 1, 3, 2)))}
        use_bias = c.get("use_bias", True) and len(w) > 1
        if use_bias:
            params[name]["bias"] = jnp.asarray(w[1])
        stride = tuple(c["strides"])

        def deconv_fn(p, xs, _name=name, _act=act, _stride=stride, _ub=use_bias):
            y = conv2d_transpose(
                xs[0].astype(jnp.float32),
                p[_name]["kernel"],
                p[_name]["bias"] if _ub else None,
                stride=_stride[0],
            )
            return _act(y)

        return deconv_fn
    if cls == "Dense":
        w = _layer_weights(h5, name)
        params[name] = {"kernel": jnp.asarray(w[0])}
        use_bias = c.get("use_bias", True) and len(w) > 1
        if use_bias:
            params[name]["bias"] = jnp.asarray(w[1])

        def dense_fn(p, xs, _name=name, _act=act, _ub=use_bias):
            y = xs[0] @ p[_name]["kernel"]
            if _ub:
                y = y + p[_name]["bias"]
            return _act(y)

        return dense_fn
    if cls == "BatchNormalization":
        w = list(_layer_weights(h5, name))
        # Keras weight order: [gamma if scale] + [beta if center] +
        # [moving_mean, moving_variance]
        scale = c.get("scale", True)
        center = c.get("center", True)
        it = iter(w)
        gamma = jnp.asarray(next(it)) if scale else None
        beta = jnp.asarray(next(it)) if center else None
        mean, var = jnp.asarray(next(it)), jnp.asarray(next(it))
        eps = c.get("epsilon", 1e-3)
        if gamma is None:
            gamma = jnp.ones_like(mean)
        if beta is None:
            beta = jnp.zeros_like(mean)
        params[name] = {"gamma": gamma, "beta": beta, "mean": mean, "var": var}

        def bn_fn(p, xs, _name=name, _eps=eps):
            q = p[_name]
            inv = jax.lax.rsqrt(q["var"] + _eps)
            return (xs[0] - q["mean"]) * inv * q["gamma"] + q["beta"]

        return bn_fn

    raise NotImplementedError(f"Keras layer type not supported: {cls} ({name})")
