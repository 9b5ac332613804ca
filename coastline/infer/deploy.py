"""Deployment artifacts for the int8 serving path.

The reference deploys by shipping a torch ``.pth`` and re-instantiating
the Python model class at load time (`/root/reference/predict_coastline.py:255-334`).
The TPU-native serving story adds two artifact forms on top of the
Orbax/.pth checkpoints:

* ``save_quantized`` / ``load_quantized`` — one ``.npz`` holding the
  BN-folded int8 weights, per-channel steps, and calibration scales.
  Serving hosts load it straight into :class:`~coastline.infer.quant.QuantizedModel`
  without re-folding or re-calibrating (calibration needs representative
  data; the artifact makes deployment data-free).
* ``export_serving`` / ``load_serving`` — an AOT `jax.export` StableHLO
  artifact of the jitted int8 forward at a fixed batch shape: the XLA
  analogue of a TorchScript/ONNX file. The exported function takes the
  quantized params as an ARGUMENT (weights live in the ``.npz`` next to
  it, not as embedded HLO constants — giant constant trees hang remote
  TPU compiles, see CLAUDE.md), so one pair of files is a complete,
  Python-model-free serving bundle.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from coastline.infer.quant import QuantizedModel, int8_forward

_NONE = "__none__"  # npz marker key suffix for absent entries (e.g. rb shortcuts)


def _flatten(prefix: str, node, out: Dict[str, np.ndarray]) -> None:
    if node is None:
        out[prefix + "/" + _NONE] = np.zeros((0,), np.int8)
    elif isinstance(node, dict):
        for k, v in node.items():
            _flatten(f"{prefix}/{k}", v, out)
    else:
        out[prefix] = np.asarray(node)


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        if parts[-1] == _NONE:
            parts, val = parts[:-1], None
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


#: Entries whose f32 "w" the arch forward reads UNCONDITIONALLY (not via
#: the policy-gated _conv int8/float switch) — never slimmed away.
_SLIM_KEEP = {"deeplabv3p": {"aspp_b4"}}  # global-pool branch matmuls w


def save_quantized(path, qm: QuantizedModel, slim: bool = True) -> None:
    """Write a QuantizedModel as one .npz (weights + scales + metadata).

    With ``slim=True`` (default) the f32 ``w`` is dropped for every conv
    the serving policy runs on the int8 path (it only reads wq/wstep/b),
    cutting the flagship artifact ~4x (204 -> ~50 MB). Loading a slim
    artifact under a *different* policy reconstructs those ``w`` as
    ``wq*step`` (weight-quantization error only); the saved policy itself
    is bit-exact either way.
    """
    from coastline.infer.quant import DEFAULT_POLICY

    policy = dict(DEFAULT_POLICY, **(qm.policy or {}))
    keep = _SLIM_KEEP.get(qm.arch, set())

    def maybe_slim(prefix, node):
        if not (isinstance(node, dict) and "wq" in node):
            return node
        key = prefix.rsplit("/", 1)[-1]
        kh, kw, cin, cout = node["w"].shape
        if key in keep or min(cin, cout) < policy["conv_min_ch"]:
            return node
        # transposed convs ("up*" entries in every arch forward, quant.py)
        # read the f32 w whenever the policy keeps them off the int8 path
        if key.startswith("up") and not policy["convT_int8"]:
            return node
        return {k: v for k, v in node.items() if k != "w"}

    flat: Dict[str, np.ndarray] = {}
    _flatten("q", qm.qparams, flat)
    if slim:
        # regroup entry dicts to apply the per-entry filter
        tree = _unflatten(flat)["q"]
        flat = {}
        _flatten("q", _map_entries("q", tree, maybe_slim), flat)
    meta = {"arch": qm.arch, "policy": qm.policy, "slim": slim,
            "scales": {k: float(v) for k, v in qm.scales.items()}}
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez_compressed(f, **flat)


def _map_entries(prefix, node, fn):
    """Apply fn to every conv-entry dict (a dict holding 'wq') in a tree."""
    if isinstance(node, dict) and "wq" not in node:
        return {k: _map_entries(f"{prefix}/{k}", v, fn)
                for k, v in node.items()}
    return fn(prefix, node)


def load_quantized(path) -> QuantizedModel:
    """Load a .npz written by :func:`save_quantized`."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    qparams = _unflatten(flat)["q"]
    if meta.get("slim"):
        def restore(prefix, node):
            if isinstance(node, dict) and "wq" in node and "w" not in node:
                node = dict(node)
                node["w"] = (node["wq"].astype(np.float32)
                             * node["wstep"][None, None, None, :])
            return node

        qparams = _map_entries("q", qparams, restore)
    return QuantizedModel(qparams, meta["scales"], arch=meta["arch"],
                          policy=meta["policy"])


def export_serving(qm: QuantizedModel, batch_size: int, image_size: int,
                   platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """AOT-export the int8 forward at a fixed shape -> serialized bytes.

    The artifact calls as ``fn(qparams, x)`` with x (B, S, S, 3) float32
    (normalized, exactly what ``QuantizedModel.__call__`` feeds) and
    returns the model's probabilities/logits as the arch defines. Pass
    ``platforms=("tpu",)`` (or ("cpu",)) to pin the lowering target;
    default is the current backend.
    """
    from jax import export as jexport

    scales, arch, policy = qm.scales, qm.arch, qm.policy

    def fn(qparams, x):
        return int8_forward(qparams, scales, x, arch=arch, policy=policy)

    x_spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3),
                                  np.float32)
    # .shape/.dtype attributes avoid materializing the (possibly device-
    # resident, ~200MB) tree on host just to read its aval.
    q_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype),
        qm.qparams)
    exp = jexport.export(jax.jit(fn), platforms=platforms)(q_spec, x_spec)
    return bytes(exp.serialize())


def load_serving(data: bytes):
    """Deserialize an :func:`export_serving` artifact -> callable
    ``fn(qparams, x)`` (jit-wrapped, compiles on first call)."""
    from jax import export as jexport

    exp = jexport.deserialize(bytearray(data))
    return jax.jit(exp.call)


def save_serving_bundle(dirpath, qm: QuantizedModel, batch_size: int,
                        image_size: int,
                        platforms: Optional[Tuple[str, ...]] = None) -> None:
    """Complete Python-model-free serving bundle: weights.npz + fn.bin."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    save_quantized(os.path.join(dirpath, "weights.npz"), qm)
    data = export_serving(qm, batch_size, image_size, platforms)
    with open(os.path.join(dirpath, "serving_fn.bin"), "wb") as f:
        f.write(data)


def load_serving_bundle(dirpath):
    """Load a bundle -> (callable fn(x), QuantizedModel). The returned fn
    closes over the loaded weights and takes just the normalized batch."""
    import os

    import jax

    qm = load_quantized(os.path.join(dirpath, "weights.npz"))
    with open(os.path.join(dirpath, "serving_fn.bin"), "rb") as f:
        fn = load_serving(f.read())
    # np.load gives HOST arrays; passing that tree to the jitted export
    # would re-upload the whole weights tree through the tunnel on EVERY
    # call (the QuantizedModel bug class, CLAUDE.md round-3 post-mortem).
    qparams_dev = jax.device_put(qm.qparams)
    return (lambda x: fn(qparams_dev, x)), qm
