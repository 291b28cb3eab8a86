"""Checkpointing: flat-npz pytree snapshots + the .pth zoo converter.

Layout parity with the reference checkpoints (exp_runner.py:296-306):
keys `sdf_network_fine` / `variance_network_fine` / `color_network_fine` /
`optimizer` / `iter_step`; files named `ckpt_{iter:06d}.npz` under
`<exp>/checkpoints/`, resumed by lexicographic-latest (exp_runner.py:113-123).

The converter maps torch weight_norm tensors (`linN.weight_v`,
`linN.weight_g`, `linN.bias`) onto our explicit (v, g, b) parametrization
bit-for-bit, so published .pth models load at output parity.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np

import jax


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Lexicographically-latest checkpoint file (exp_runner.py:113-123)."""
    if not os.path.isdir(ckpt_dir):
        return None
    names = sorted(
        n for n in os.listdir(ckpt_dir) if n.endswith(".npz") and n.startswith("ckpt_")
    )
    return os.path.join(ckpt_dir, names[-1]) if names else None


# ---------------------------------------------------------------------------
# .pth (torch) -> pytree conversion for the published model zoo
# ---------------------------------------------------------------------------

def convert_torch_state_dict(
    state: Dict[str, Any], n_layers_hint: Optional[int] = None
) -> Dict[str, Any]:
    """Convert a reference network state_dict (linN.weight_v/weight_g/bias
    or plain linN.weight) into our {'layers': [{v,g,b} ...]} pytree.

    `se3_refine` is returned separately under key 'se3_refine' when present.
    """
    layer_ids = set()
    for k in state:
        m = re.match(r"lin(\d+)\.", k)
        if m:
            layer_ids.add(int(m.group(1)))
    layers = []
    for l in sorted(layer_ids):
        pre = f"lin{l}."
        if pre + "weight_v" in state:
            layers.append(
                {
                    "v": np.asarray(state[pre + "weight_v"]),
                    "g": np.asarray(state[pre + "weight_g"]).reshape(-1),
                    "b": np.asarray(state[pre + "bias"]),
                }
            )
        else:
            layers.append(
                {
                    "w": np.asarray(state[pre + "weight"]),
                    "b": np.asarray(state[pre + "bias"]),
                }
            )
    out: Dict[str, Any] = {"layers": layers}
    if "se3_refine" in state:
        out["se3_refine"] = np.asarray(state["se3_refine"])
    if "variance" in state:
        out["variance"] = np.asarray(state["variance"])
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `ckpt_XXXXXX.pth` and convert every network to our
    parametrization.  Requires torch (CPU) at call time only."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)

    def np_state(sd):
        return {k: v.numpy() for k, v in sd.items()}

    out: Dict[str, Any] = {"iter_step": int(ckpt.get("iter_step", 0))}
    sdf_state = np_state(ckpt["sdf_network_fine"])
    sdf_tree = convert_torch_state_dict(sdf_state)
    out["sdf"] = {"layers": sdf_tree["layers"]}
    if "se3_refine" in sdf_tree:
        out["se3_refine"] = sdf_tree["se3_refine"]
    out["color"] = {
        "layers": convert_torch_state_dict(np_state(ckpt["color_network_fine"]))["layers"]
    }
    var_state = np_state(ckpt["variance_network_fine"])
    out["variance"] = {"variance": np.asarray(var_state["variance"])}
    return out
