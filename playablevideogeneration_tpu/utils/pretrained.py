"""Pretrained-backbone weight loading and wiring.

The reference downloads its pretrained backbones at runtime (torchvision
VGG19 at model/layers/vgg.py:15, FID InceptionV3 with TF-ported weights at
pytorch_fid/inception.py:13, TF-Hub I3D at evaluation/metrics/fvd.py:88,
LPIPS-VGG at evaluation/metrics/lpips.py:14).  This environment has no
network egress, so the TPU framework instead loads weights from ``.npz``
files produced offline by ``tools/convert_weights.py`` (see
docs/PRETRAINED_WEIGHTS.md for the conversion runbook).

Resolution order for each backbone:
  1. explicit per-backbone path: config ``tpu.pretrained_weights.<name>``;
  2. ``<dir>/<canonical filename>`` where ``<dir>`` is config
     ``tpu.pretrained_weights_dir`` or env ``PVG_PRETRAINED_WEIGHTS``;
  3. unavailable -> the caller degrades gracefully (random-feature VGG,
     ``*_unavailable`` metric markers).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

# Canonical filenames inside a pretrained-weights directory.
WEIGHT_FILES = {
    "vgg19": "vgg19.npz",
    "fid_inception": "fid_inception.npz",
    "i3d": "i3d.npz",
    "lpips_lin": "lpips_lin.npz",
    "frcnn": "frcnn.npz",
}

_COLLECTIONS = ("params", "batch_stats")


def save_variables_npz(variables: Dict, path: str) -> None:
    """Flattens a flax variables dict ({collection: nested tree}) into an
    npz with '/'-joined keys, collection name first."""
    flat: Dict[str, np.ndarray] = {}

    def _walk(prefix: str, tree: Dict):
        for k, v in tree.items():
            key = f"{prefix}/{k}"
            if isinstance(v, dict):
                _walk(key, v)
            else:
                flat[key] = np.asarray(v)

    for collection in variables:
        _walk(collection, variables[collection])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_variables_npz(path: str) -> Dict:
    """Inverse of :func:`save_variables_npz`."""
    data = np.load(path)
    variables: Dict = {}
    for key, value in data.items():
        parts = key.split("/")
        node = variables
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return variables


def _tpu_block(config) -> Dict:
    return config.get("tpu", {}) if isinstance(config, dict) else {}


def find_weights(config, name: str) -> Optional[str]:
    """Resolves the weight file for backbone `name`, or None."""
    tpu = _tpu_block(config)
    explicit = (tpu.get("pretrained_weights") or {}).get(name)
    if explicit:
        if not os.path.isfile(explicit):
            raise FileNotFoundError(
                f"Configured tpu.pretrained_weights.{name} = '{explicit}' not found")
        return explicit
    directory = tpu.get("pretrained_weights_dir") or os.environ.get(
        "PVG_PRETRAINED_WEIGHTS")
    if directory:
        candidate = os.path.join(directory, WEIGHT_FILES[name])
        if os.path.isfile(candidate):
            return candidate
    return None


def get_vgg_variables(config, logger=None) -> Tuple[Dict, bool]:
    """Returns (vgg variables, pretrained flag).  Falls back to the
    deterministic random init used throughout the framework."""
    import jax

    from playablevideogeneration_tpu.models import vgg as vgg_lib

    path = find_weights(config, "vgg19")
    if path:
        if logger is not None:
            logger.print(f"- Loading pretrained VGG19 weights from {path}")
        return load_variables_npz(path), True
    return vgg_lib.random_vgg_variables(jax.random.PRNGKey(97)), False


def get_lpips_fn(config, logger=None, vgg_variables=None,
                 vgg_pretrained=None) -> Optional[Any]:
    """Builds the LPIPS metric if both the VGG backbone and the linear-head
    weights are available (true-LPIPS parity needs both)."""
    from playablevideogeneration_tpu.evaluation.metrics import lpips as lpips_lib
    from playablevideogeneration_tpu.models import vgg as vgg_lib

    lin_path = find_weights(config, "lpips_lin")
    if vgg_variables is None:
        vgg_variables, vgg_pretrained = get_vgg_variables(config)
    if lin_path is None or not vgg_pretrained:
        return None
    if logger is not None:
        logger.print(f"- Loading LPIPS linear heads from {lin_path}")
    heads = lpips_lib.load_lpips_linear_weights(lin_path)
    return lpips_lib.make_lpips_fn(vgg_lib.make_vgg_apply(vgg_variables), heads)


def _inception_variables(config, logger=None) -> Optional[Dict]:
    path = find_weights(config, "fid_inception")
    if path is None:
        return None
    if logger is not None:
        logger.print(f"- Loading FID InceptionV3 weights from {path}")
    return load_variables_npz(path)


def get_fid_extractor(config, logger=None, variables=None) -> Optional[Any]:
    from playablevideogeneration_tpu.evaluation.metrics import inception

    if variables is None:
        variables = _inception_variables(config, logger)
    if variables is None:
        return None
    return inception.make_fid_extractor(variables)


def get_class_probability_fn(config, logger=None, variables=None) -> Optional[Any]:
    """Inception classifier head (for the Inception Score), available when
    the FID checkpoint carries its 'fc' head (tools/convert_weights.py
    keeps it)."""
    from playablevideogeneration_tpu.evaluation.metrics import inception

    if variables is None:
        variables = _inception_variables(config, logger)
    if variables is None or "fc" not in variables.get("params", {}):
        return None
    return inception.make_class_probability_fn(variables)


def get_fvd_embedder(config, logger=None) -> Optional[Any]:
    from playablevideogeneration_tpu.evaluation.metrics import i3d

    path = find_weights(config, "i3d")
    if path is None:
        return None
    if logger is not None:
        logger.print(f"- Loading FVD I3D weights from {path}")
    return i3d.make_fvd_embedder(load_variables_npz(path))


def evaluation_backbones(config, logger=None) -> Dict[str, Any]:
    """All pluggable offline-evaluation backbones resolved from config, as
    kwargs for the DatasetEvaluator family."""
    vgg_variables, vgg_pretrained = get_vgg_variables(config, logger)
    inception_variables = _inception_variables(config, logger)
    want_is = bool(config.get("evaluation", {}).get(
        "compute_inception_score", False))
    return dict(
        vgg_variables=vgg_variables if vgg_pretrained else None,
        lpips_fn=get_lpips_fn(config, logger, vgg_variables=vgg_variables,
                              vgg_pretrained=vgg_pretrained),
        fid_extractor=get_fid_extractor(config, logger,
                                        variables=inception_variables),
        fvd_embedder=get_fvd_embedder(config, logger),
        class_probability_fn=(get_class_probability_fn(
            config, logger, variables=inception_variables) if want_is else None),
    )
