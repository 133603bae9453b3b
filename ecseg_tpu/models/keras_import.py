"""Keras checkpoint -> JAX weight import.

The reference's metaseg model exists only as a Keras blob
(``models/metaseg.h5``, loaded at reference src/utils.py:27-33); its
architecture is not in code anywhere.  This module reconstructs the layer
graph from the checkpoint's embedded config JSON and executes it as a pure
JAX function, so the blob drops into the TPU pipeline without TensorFlow.

Two container formats are supported:

- legacy Keras HDF5 (``.h5`` with an embedded ``model_config`` attr and
  per-layer ``model_weights`` groups) -- what tf.keras <= 2.x and
  ``save_format="h5"`` produce, and the likely format of the real
  metaseg.h5;
- Keras 3 native ``.keras`` zip archives (``config.json`` +
  ``model.weights.h5`` whose groups are snake-cased class names deduped
  per container) via :func:`import_keras_file`.

Supported layer types cover the conv-U-Net/classifier families these
pipelines use: InputLayer, Conv2D, Conv2DTranspose, SeparableConv2D,
DepthwiseConv2D, MaxPooling2D, AveragePooling2D, UpSampling2D, Concatenate,
Add, Activation (+fused activations), BatchNormalization (inference mode),
Dropout (no-op), ZeroPadding2D, Cropping2D, Rescaling, Dense, Flatten,
GlobalAveragePooling2D, plus nested Functional/Sequential sub-models
(including multi-output sub-models consumed at tensor indices > 0).

Also provides flat .npz pytree save/load used to cache converted weights.
"""

from __future__ import annotations

import json
import re
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


class _LegacyH5Fetcher:
    """Weight lookup for legacy Keras H5 saves: per-layer groups under
    ``model_weights`` keyed by the USER layer name, ordered by the group's
    ``weight_names`` attr.  Nested sub-models keep one group whose
    weight_names are slash paths relative to it (``subconv/kernel:0``)."""

    def __init__(self, group, names: List[str] = None):
        self.group = group
        self.names = names  # relative weight paths when nested

    def fetch(self, layer_name: str) -> List[np.ndarray]:
        if self.names is not None:
            sel = [n for n in self.names if n.split("/", 1)[0] == layer_name]
            return [np.array(self.group[n]) for n in sel]
        if layer_name not in self.group:
            return []
        grp = self.group[layer_name]
        names = [_decode(n) for n in grp.attrs.get("weight_names", [])]
        if names:
            return [np.array(grp[n]) for n in names]
        out = []

        def visit(_, obj):
            import h5py

            if isinstance(obj, h5py.Dataset):
                out.append(np.array(obj))

        grp.visititems(visit)
        return out

    def child(self, layer_name: str, child_layers_cfg) -> "_LegacyH5Fetcher":
        if self.names is not None:
            sub = [
                n.split("/", 1)[1]
                for n in self.names
                if n.split("/", 1)[0] == layer_name and "/" in n
            ]
            return _LegacyH5Fetcher(self.group[layer_name], sub)
        grp = self.group[layer_name]
        names = [_decode(n) for n in grp.attrs.get("weight_names", [])]
        return _LegacyH5Fetcher(grp, names)


def _to_snake_case(name: str) -> str:
    """keras.src.utils.naming.to_snake_case (Conv2D -> conv2d)."""
    name = re.sub(r"\W+", "", name)
    name = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    name = re.sub(r"([a-z])([A-Z])", r"\1_\2", name).lower()
    return name


def _k3_group_names(layers_cfg) -> Dict[str, str]:
    """Config layer name -> weights-H5 group name for Keras 3 saves: the
    snake-cased class name, deduped per container in config (creation)
    order with _1, _2... suffixes."""
    counts: Dict[str, int] = {}
    out: Dict[str, str] = {}
    for lc in layers_cfg:
        base = _to_snake_case(lc["class_name"])
        k = counts.get(base, 0)
        counts[base] = k + 1
        out[lc["config"]["name"]] = base if k == 0 else f"{base}_{k}"
    return out


class _K3Fetcher:
    """Weight lookup for Keras 3 ``model.weights.h5``: groups
    ``layers/<snake_class[_N]>/vars/{0,1,...}``; nested models add another
    ``layers`` level."""

    def __init__(self, layers_group, layers_cfg):
        self.group = layers_group
        self.map = _k3_group_names(layers_cfg)

    def fetch(self, layer_name: str) -> List[np.ndarray]:
        key = self.map.get(layer_name)
        if key is None or self.group is None or key not in self.group:
            return []
        g = self.group[key]
        if "vars" not in g:
            return []
        vars_g = g["vars"]
        return [np.array(vars_g[i]) for i in sorted(vars_g.keys(), key=int)]

    def child(self, layer_name: str, child_layers_cfg) -> "_K3Fetcher":
        # mirror fetch()'s defenses: a weightless nested wrapper may have no
        # group at this level (self.group is None after a prior empty child)
        # or no entry for this layer -- descend to an empty fetcher so its
        # own weightless sublayers still import
        key = self.map.get(layer_name)
        sub = None
        if key is not None and self.group is not None and key in self.group:
            g = self.group[key]
            sub = g["layers"] if "layers" in g else None
        return _K3Fetcher(sub, child_layers_cfg)


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
    """Legacy Keras H5 whole-model save -> KerasModel."""
    import h5py

    with h5py.File(path, "r") as h5:
        cfg_raw = h5.attrs.get("model_config")
        if cfg_raw is None:
            raise ValueError(f"{path} has no embedded model_config")
        cfg = json.loads(_decode(cfg_raw))
        mw = h5["model_weights"] if "model_weights" in h5 else h5
        return _import_from_config(cfg, _LegacyH5Fetcher(mw))


def import_keras_file(path: str) -> KerasModel:
    """Any supported Keras checkpoint: a Keras 3 native ``.keras`` zip
    archive or a legacy ``.h5`` save."""
    import zipfile

    if zipfile.is_zipfile(path):
        import io

        import h5py

        with zipfile.ZipFile(path) as z:
            cfg = json.loads(z.read("config.json"))
            with h5py.File(io.BytesIO(z.read("model.weights.h5")), "r") as wh5:
                layers_group = wh5["layers"] if "layers" in wh5 else None
                fetcher = _K3Fetcher(
                    layers_group, cfg["config"].get("layers", [])
                )
                return _import_from_config(cfg, fetcher)
    return import_keras_h5(path)


def _import_from_config(cfg: Dict, fetcher) -> KerasModel:
    params: Dict[str, Any] = {}
    forward = _build_model_fn(cfg["class_name"], cfg["config"], fetcher, params)
    return KerasModel(params, forward, cfg)


def _pick(value, tensor_idx: int):
    """Select one tensor from a producer's output (multi-output producers
    return lists)."""
    if isinstance(value, (list, tuple)):
        return value[tensor_idx]
    if tensor_idx not in (0, None):
        raise ValueError(
            f"tensor index {tensor_idx} requested from single-output producer"
        )
    return value


def _build_model_fn(class_name: str, model_cfg: Dict, fetcher, params) -> Callable:
    """Compile a (possibly nested) Keras model config into
    ``forward(params, x_or_list) -> tensor_or_list``."""
    layers_cfg = model_cfg["layers"]
    # steps: (out key (name, node_idx), input refs [(name, node_idx,
    # tensor_idx)], fn)
    steps: List[Tuple[Tuple[str, int], List[Tuple[str, int, int]], Callable]] = []

    if class_name == "Sequential":
        prev = ("__input__", 0, 0)
        inputs = ["__input__"]
        for lc in layers_cfg:
            if lc["class_name"] == "InputLayer":
                continue
            name = lc["config"]["name"]
            fn = _make_layer_fn(lc, name, fetcher, params)
            if fn is None:
                continue
            steps.append(((name, 0), [prev], fn))
            prev = (name, 0, 0)
        outputs = [prev]
    else:  # Functional / Model
        inputs = []
        for lc in layers_cfg:
            name = lc["config"]["name"]
            if lc["class_name"] == "InputLayer":
                inputs.append(name)
                continue
            nodes = _inbound_refs(lc)
            fn = _make_layer_fn(lc, name, fetcher, params)
            if fn is None:  # identity layer (Dropout etc.)
                fn = lambda p, xs: xs[0]
            # a shared layer is called once per inbound node; every call
            # reuses the same weights but gets its own env slot.  In the
            # LEGACY format, nested models carry an implicit construction
            # node at index 0 (their internal graph), so their serialized
            # call indices start at 1; Keras 3 dict-format refs count calls
            # from 0.
            raw_nodes = lc.get("inbound_nodes", [])
            legacy_fmt = bool(raw_nodes) and not isinstance(raw_nodes[0], dict)
            nested = lc["class_name"] in ("Functional", "Model", "Sequential")
            offset = 1 if (nested and legacy_fmt) else 0
            for node_idx, in_refs in enumerate(nodes):
                steps.append(((name, offset + node_idx), in_refs, fn))
        out_spec = model_cfg.get("output_layers", [])
        if out_spec and isinstance(out_spec[0], str):
            out_spec = [out_spec]  # Keras 3 single-output flat form
        if out_spec:
            outputs = [
                (
                    o[0],
                    o[1] if len(o) > 1 else 0,
                    o[2] if len(o) > 2 else 0,
                )
                for o in out_spec
            ]
        else:
            n, i = steps[-1][0]
            outputs = [(n, i, 0)]

        # The config lists layers in creation order; with shared layers a
        # later-created producer can feed an earlier layer's second call,
        # so execute in dependency order (Kahn) instead.
        available = {(name, 0) for name in inputs}
        ordered, remaining = [], steps
        while remaining:
            rest = []
            for s in remaining:
                if all(r[:2] in available for r in s[1]):
                    ordered.append(s)
                    available.add(s[0])
                else:
                    rest.append(s)
            if len(rest) == len(remaining):
                missing = {r[:2] for s in remaining for r in s[1]} - available
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
            env[out] = fn(p, [_pick(env[(n, i)], t) for (n, i, t) in ins])
        res = [_pick(env[(n, i)], t) for (n, i, t) in outputs]
        return res[0] if len(res) == 1 else res

    return forward


def _inbound_refs(layer_cfg) -> List[List[Tuple[str, int, int]]]:
    """All inbound nodes of a layer as [(producer_name, producer_node_idx,
    producer_tensor_idx)] lists -- one entry per call of the layer (shared
    layers have several).  Handles both the legacy nested-list format and
    the Keras 3 dict format.  The node index selects WHICH call of a shared
    producer feeds this layer; the tensor index selects which output of a
    multi-output producer (e.g. a nested sub-model)."""
    out: List[List[Tuple[str, int, int]]] = []
    for node in layer_cfg.get("inbound_nodes", []):
        if isinstance(node, dict):  # Keras 3 style
            refs: List[Tuple[str, int, int]] = []

            def walk(a):
                if isinstance(a, dict):
                    hist = a.get("config", {}).get("keras_history")
                    if hist is not None:
                        refs.append(
                            (
                                hist[0],
                                hist[1] if len(hist) > 1 else 0,
                                hist[2] if len(hist) > 2 else 0,
                            )
                        )
                        return
                    for v in a.values():
                        walk(v)
                elif isinstance(a, (list, tuple)):
                    for e in a:
                        walk(e)

            walk(node.get("args", []))
            out.append(refs)
        else:  # legacy: [[name, node_idx, tensor_idx, kwargs], ...]
            refs = [
                (
                    entry[0],
                    entry[1] if len(entry) > 1 else 0,
                    entry[2] if len(entry) > 2 else 0,
                )
                for entry in node
            ]
            out.append(refs)
    return out


def _depthwise_conv(x, kernel, stride: int, padding: str):
    """Keras DepthwiseConv2D semantics: kernel (h, w, in_ch, mult) ->
    grouped conv with feature_group_count = in_ch; output channel order
    g * mult + m matches Keras."""
    from jax import lax

    from .layers import _precision_for

    h, w, in_ch, mult = kernel.shape
    rhs = kernel.reshape(h, w, 1, in_ch * mult)
    return lax.conv_general_dilated(
        x,
        rhs,
        (stride, stride),
        padding.upper(),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=in_ch,
        precision=_precision_for(x),
    )


def _make_layer_fn(lc, name, fetcher, params):
    cls = lc["class_name"]
    c = lc["config"]
    act = _ACTIVATIONS.get(c.get("activation", "linear"), lambda x: x)

    if cls in ("Dropout", "SpatialDropout2D", "GaussianNoise"):
        return None
    if cls in ("Functional", "Model", "Sequential"):
        # nested sub-model: compile recursively; its params live under the
        # sub-model's name, its weights under the sub-model's weight scope
        subparams: Dict[str, Any] = {}
        subfwd = _build_model_fn(
            "Sequential" if cls == "Sequential" else "Functional",
            c,
            fetcher.child(name, c.get("layers", [])),
            subparams,
        )
        params[name] = subparams

        def nested_fn(p, xs, _name=name, _fwd=subfwd):
            return _fwd(p[_name], xs if len(xs) > 1 else xs[0])

        return nested_fn
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
        w = fetcher.fetch(name)
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
    if cls == "DepthwiseConv2D":
        w = fetcher.fetch(name)
        params[name] = {"kernel": jnp.asarray(w[0])}
        use_bias = c.get("use_bias", True) and len(w) > 1
        if use_bias:
            params[name]["bias"] = jnp.asarray(w[1])
        stride = tuple(c["strides"])
        pad = c["padding"]

        def dwconv_fn(p, xs, _name=name, _act=act, _stride=stride, _pad=pad, _ub=use_bias):
            y = _depthwise_conv(
                xs[0].astype(jnp.float32), p[_name]["kernel"], _stride[0], _pad
            )
            if _ub:
                y = y + p[_name]["bias"]
            return _act(y)

        return dwconv_fn
    if cls == "SeparableConv2D":
        w = fetcher.fetch(name)
        # weight order: depthwise_kernel, pointwise_kernel[, bias]
        params[name] = {
            "depthwise": jnp.asarray(w[0]),
            "pointwise": jnp.asarray(w[1]),
        }
        use_bias = c.get("use_bias", True) and len(w) > 2
        if use_bias:
            params[name]["bias"] = jnp.asarray(w[2])
        stride = tuple(c["strides"])
        pad = c["padding"]

        def sepconv_fn(p, xs, _name=name, _act=act, _stride=stride, _pad=pad, _ub=use_bias):
            y = _depthwise_conv(
                xs[0].astype(jnp.float32), p[_name]["depthwise"], _stride[0], _pad
            )
            y = conv2d(
                y,
                p[_name]["pointwise"],
                p[_name]["bias"] if _ub else None,
                stride=1,
                padding="SAME",
            )
            return _act(y)

        return sepconv_fn
    if cls == "Conv2DTranspose":
        w = fetcher.fetch(name)
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
        w = fetcher.fetch(name)
        params[name] = {"kernel": jnp.asarray(w[0])}
        use_bias = c.get("use_bias", True) and len(w) > 1
        if use_bias:
            params[name]["bias"] = jnp.asarray(w[1])

        def dense_fn(p, xs, _name=name, _act=act, _ub=use_bias):
            from jax import lax

            from .layers import _precision_for

            y = lax.dot(
                xs[0], p[_name]["kernel"], precision=_precision_for(xs[0])
            )
            if _ub:
                y = y + p[_name]["bias"]
            return _act(y)

        return dense_fn
    if cls == "BatchNormalization":
        w = list(fetcher.fetch(name))
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
