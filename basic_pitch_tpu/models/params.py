"""Parameter pytree (de)serialization and the shipped ICASSP-2022 checkpoint.

Checkpoints are stored as flat ``.npz`` archives with ``/``-joined keys
(e.g. ``contour_conv/w``). The shipped checkpoint
``basic_pitch_tpu/assets/nmp_icassp2022.npz`` holds the same weights as the
reference's serialized models (`/root/reference/basic_pitch/saved_models/`),
converted once by ``tools/export_reference_weights.py``; the Apache-2.0
licensed weights are redistributable model assets, not code.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Union

import numpy as np

Params = Dict[str, Any]
PathLike = Union[str, pathlib.Path]

ASSETS_DIR = pathlib.Path(__file__).resolve().parent.parent / "assets"
ICASSP_2022_WEIGHTS_PATH = ASSETS_DIR / "nmp_icassp2022.npz"


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for key, value in params.items():
        path = f"{prefix}{key}"
        if isinstance(value, dict):
            flat.update(flatten_params(value, prefix=f"{path}/"))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    # deferred so importing this module (e.g. for the CLI's --help default
    # checkpoint path) never initializes jax
    import jax.numpy as jnp

    tree: Params = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_params(path: PathLike, params: Params) -> None:
    np.savez(path, **flatten_params(params))


def load_params(path: PathLike = ICASSP_2022_WEIGHTS_PATH) -> Params:
    with np.load(path) as archive:
        return unflatten_params({k: archive[k] for k in archive.files})
