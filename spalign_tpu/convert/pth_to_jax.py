"""Convert public DRN ``.pth`` state_dicts into flax variable pytrees.

Replaces the reference's one-time PyTorch->Chainer converter
(models/convert_pth2ch.py): walks the donor state_dict by key, transposes
conv kernels OIHW -> HWIO, splits BN into params (scale/bias) and
batch_stats (mean/var), and verifies completeness against a fresh flax
init (same param count / shapes — the reference's own bar at
convert_pth2ch.py:57-60).

Donor key layout (see convert/torch_drn.py):
  conv1.weight, bn1.{weight,bias,running_mean,running_var}      (arch C)
  layerN.M.conv{1,2,3}.weight, layerN.M.bn{1,2,3}.*             (res blocks)
  layerN.M.downsample.0.weight, layerN.M.downsample.1.*
  layerN.{3i}.weight, layerN.{3i+1}.*                           (conv layers)
  fc.{weight,bias}
"""

from __future__ import annotations

import pickle
import re
from typing import Dict

import numpy as np


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_MAP = {"weight": ("params", "scale"), "bias": ("params", "bias"),
           "running_mean": ("batch_stats", "mean"),
           "running_var": ("batch_stats", "var")}


def convert_drn_state_dict(state_dict, arch: str = "C"):
    """-> {'params': ..., 'batch_stats': ...} flax variables dict."""
    params: Dict = {}
    stats: Dict = {}

    def put(col, path, v):
        _set(params if col == "params" else stats, path, v)

    for key, value in state_dict.items():
        v = _to_np(value)
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[0] == "conv1":
            put("params", ("conv1", "kernel"), v.transpose(2, 3, 1, 0))
        elif parts[0] == "bn1":
            col, leaf = _BN_MAP[parts[1]]
            put(col, ("bn1", leaf), v)
        elif parts[0] == "fc":
            if parts[1] == "weight":
                put("params", ("fc", "kernel"), v.transpose(2, 3, 1, 0))
            else:
                put("params", ("fc", "bias"), v)
        elif re.fullmatch(r"layer\d+", parts[0]):
            layer = parts[0]
            lnum = int(layer[5:])
            is_conv_layer = (arch == "D" and lnum in (0, 1, 2, 7, 8))
            if is_conv_layer:
                # layerN.{3i}.weight (conv) / layerN.{3i+1}.* (bn)
                seq = int(parts[1])
                i, kind = divmod(seq, 3)
                if kind == 0:
                    put("params", (layer, f"conv{i}", "kernel"),
                        v.transpose(2, 3, 1, 0))
                elif kind == 1:
                    col, leaf = _BN_MAP[parts[2]]
                    put(col, (layer, f"bn{i}", leaf), v)
                else:
                    raise ValueError(f"unexpected donor key {key}")
            else:
                block = f"block{int(parts[1])}"
                sub = parts[2]
                if sub.startswith("conv"):
                    put("params", (layer, block, sub, "kernel"),
                        v.transpose(2, 3, 1, 0))
                elif sub.startswith("bn"):
                    col, leaf = _BN_MAP[parts[3]]
                    put(col, (layer, block, sub, leaf), v)
                elif sub == "downsample":
                    if parts[3] == "0":
                        put("params", (layer, block, "downsample_conv",
                                       "kernel"), v.transpose(2, 3, 1, 0))
                    else:
                        col, leaf = _BN_MAP[parts[4]]
                        put(col, (layer, block, "downsample_bn", leaf), v)
                else:
                    raise ValueError(f"unexpected donor key {key}")
        else:
            raise ValueError(f"unexpected donor key {key}")

    return {"params": params, "batch_stats": stats}


def verify_against_init(variables, model, input_hw=(224, 224)):
    """Assert converted tree matches a fresh init structurally (leaf set
    and shapes).  Raises on mismatch; returns leaf count."""
    import jax

    init = model.init(jax.random.key(0),
                      np.zeros((1, *input_hw, 3), np.float32))
    flat_init = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(variables)[0]
    paths_i = {jax.tree_util.keystr(p): tuple(v.shape)
               for p, v in flat_init}
    paths_c = {jax.tree_util.keystr(p): tuple(np.shape(v))
               for p, v in flat_conv}
    missing = sorted(set(paths_i) - set(paths_c))
    extra = sorted(set(paths_c) - set(paths_i))
    if missing or extra:
        raise ValueError(f"converted tree mismatch: missing={missing[:8]} "
                         f"extra={extra[:8]}")
    for k, s in paths_i.items():
        if paths_c[k] != s:
            raise ValueError(f"shape mismatch at {k}: init {s} vs "
                             f"converted {paths_c[k]}")
    return len(paths_i)


def load_drn_checkpoint(pth_path: str, model_name: str = "drn_c_26"):
    """Load a donor .pth (torch serialized state_dict) and convert.

    Returns (model, variables) ready for model.apply(variables, x).
    """
    import torch

    from spalign_tpu.models.drn import DRN_FACTORIES

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    arch = "C" if "_c_" in model_name else "D"
    variables = convert_drn_state_dict(state, arch=arch)
    model = DRN_FACTORIES[model_name](out_map=True, out_middle=True)
    verify_against_init(variables, model)
    import jax

    variables = jax.tree.map(lambda x: np.asarray(x, np.float32), variables)
    return model, variables


def save_pytree(variables, path: str):
    """Persist a variables pytree (framework-native .npz-like pickle)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten(variables)
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": [np.asarray(x)
                                                    for x in flat]}, f)


def load_pytree(path: str):
    import jax

    with open(path, "rb") as f:
        d = pickle.load(f)
    return jax.tree_util.tree_unflatten(d["treedef"], d["leaves"])
