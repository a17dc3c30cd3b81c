#!/usr/bin/env python3
"""Offline pretrained-weight converter: torch / TF checkpoints -> .npz.

The reference downloads these backbones at runtime (torchvision VGG19,
pytorch_fid InceptionV3 [pytorch_fid/inception.py:13], TF-Hub I3D
[evaluation/metrics/fvd.py:88], LPIPS-VGG linear heads
[evaluation/metrics/lpips.py:14]).  This tool converts their checkpoints —
exported on any machine with network access — into the .npz format consumed
by ``playablevideogeneration_tpu.utils.pretrained``.

Usage (see docs/PRETRAINED_WEIGHTS.md for how to obtain each input):

    python tools/convert_weights.py vgg19         --input vgg19.pth        --output weights/vgg19.npz
    python tools/convert_weights.py fid-inception --input pt_inception.pth --output weights/fid_inception.npz
    python tools/convert_weights.py i3d           --input i3d_vars.npz     --output weights/i3d.npz
    python tools/convert_weights.py lpips         --input lpips_vgg.pth    --output weights/lpips_lin.npz

Only torch (CPU) and numpy are needed; inputs may be torch ``.pth`` state
dicts or plain ``.npz`` name->array maps.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from playablevideogeneration_tpu.utils.pretrained import save_variables_npz  # noqa: E402


def _load_state_dict(path: str) -> dict:
    """Loads a torch .pth state_dict or an .npz as {name: np.ndarray}."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def convert_vgg19(input_path: str, output_path: str) -> None:
    from playablevideogeneration_tpu.models.vgg import convert_torch_vgg19

    state = _load_state_dict(input_path)
    # Accept a full torchvision vgg19 state_dict (keys 'features.0.weight')
    # or a features-only one (keys '0.weight').
    state = {k.removeprefix("features."): v for k, v in state.items()
             if not k.startswith("classifier.")}
    variables = convert_torch_vgg19(state)
    save_variables_npz(variables, output_path)


def convert_fid_inception(input_path: str, output_path: str) -> None:
    from playablevideogeneration_tpu.evaluation.metrics.inception import (
        convert_torch_inception,
    )

    variables = convert_torch_inception(_load_state_dict(input_path))
    save_variables_npz(variables, output_path)


def convert_i3d(input_path: str, output_path: str) -> None:
    from playablevideogeneration_tpu.evaluation.metrics.i3d import convert_tf_i3d

    variables = convert_tf_i3d(_load_state_dict(input_path))
    save_variables_npz(variables, output_path)


def convert_lpips(input_path: str, output_path: str) -> None:
    """Extracts the 5 linear-head weight vectors from an official LPIPS
    (vgg backbone) checkpoint: keys 'lin<i>.model.1.weight' of shape
    (1, C, 1, 1) -> flat (C,) arrays lin0..lin4."""
    state = _load_state_dict(input_path)
    out = {}
    for i in range(5):
        key = next((k for k in state
                    if k.startswith(f"lin{i}.") and k.endswith("weight")), None)
        if key is None:
            raise KeyError(f"LPIPS checkpoint missing linear head lin{i}")
        out[f"lin{i}"] = np.asarray(state[key]).reshape(-1)
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    np.savez(output_path, **out)


def convert_frcnn(input_path: str, output_path: str) -> None:
    """torchvision fasterrcnn_resnet50_fpn (COCO) state_dict -> the JAX
    detector's variables (evaluation/metrics/frcnn.py), incl. the fc6
    input-row reorder for the NHWC RoI layout."""
    from playablevideogeneration_tpu.evaluation.metrics.frcnn import (
        convert_torch_frcnn_full,
    )

    variables = convert_torch_frcnn_full(_load_state_dict(input_path))
    save_variables_npz(variables, output_path)


CONVERTERS = {
    "vgg19": convert_vgg19,
    "fid-inception": convert_fid_inception,
    "i3d": convert_i3d,
    "lpips": convert_lpips,
    "frcnn": convert_frcnn,
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("backbone", choices=sorted(CONVERTERS))
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    CONVERTERS[args.backbone](args.input, args.output)
    print(f"Converted {args.backbone}: {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
