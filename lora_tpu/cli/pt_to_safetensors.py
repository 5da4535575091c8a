"""Convert legacy .pt LoRA / TI files into single-file safetensors
(reference cli_pt_to_safetensors.py). Auto-detects TI (dict) vs LoRA (list);
per-model overrides via --name.rank / --name.target_modules."""

from __future__ import annotations

import sys


from ..formats.safetensors_io import (
    EMBED_FLAG,
    UNET_DEFAULT_TARGET_REPLACE,
    save_file,
)


def convert(*modelpaths, outpath: str, **settings):
    """convert(path1, path2, ..., outpath=..., name.rank=4,
    name.target_modules=A,B)  — model name = file stem."""
    weights = {}
    metadata = {}
    import json

    for path in modelpaths:
        name = path.split("/")[-1].split(".")[0]
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict):  # TI embeds
            for token, tensor in obj.items():
                weights[token] = tensor.detach().float().numpy()
                metadata[token] = EMBED_FLAG
            continue
        # LoRA flat list
        rank = int(settings.get(f"{name}.rank", 4))
        target = settings.get(f"{name}.target_modules",
                              UNET_DEFAULT_TARGET_REPLACE)
        if isinstance(target, str):
            target = set(t.strip() for t in target.split(","))
        metadata[name] = json.dumps(list(target))
        for i, w in enumerate(obj):
            is_up = i % 2 == 0
            idx = i // 2
            arr = w.detach().numpy()
            if is_up:
                metadata[f"{name}:{idx}:rank"] = str(rank)
                weights[f"{name}:{idx}:up"] = arr
            else:
                weights[f"{name}:{idx}:down"] = arr

    print(f"Saving weights to {outpath}")
    save_file(weights, outpath, metadata)


def main():
    args = sys.argv[1:]
    paths = []
    kwargs = {}
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a[2:].split("=", 1)
                i += 1
            else:
                k, v = a[2:], args[i + 1]
                i += 2
            kwargs[k] = v
        else:
            paths.append(a)
            i += 1
    outpath = kwargs.pop("outpath")
    convert(*paths, outpath=outpath, **kwargs)


if __name__ == "__main__":
    main()
