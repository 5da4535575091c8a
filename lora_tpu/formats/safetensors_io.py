"""LoRA safetensors schema — bit-compatible with the reference format.

Schema (reference: lora_diffusion/lora.py:451-535):

  tensors   "{model}:{idx}:up"   fp16  (out, r)  [linear]  / (out, r, 1, 1) [conv]
            "{model}:{idx}:down" fp16  (r, in)             / (r, in, kh, kw)
            "{token}"            fp32  (768,)    textual-inversion embeds
  metadata  "{model}"            json list of target-replace class names
            "{model}:{idx}:rank" str(rank)
            "{token}"            "<embed>"

``idx`` follows the reference's module traversal order, reproduced by
lora_tpu.core.sites.  ``up`` is stored pre-multiplied by the module scale
(reference realize_as_lora, lora.py:60-61).
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .reader import SafetensorsFile, load_file, safe_open, save_file

EMBED_FLAG = "<embed>"

# Target-set names mirror the reference (lora.py:159-167). They are *torch
# class names* kept verbatim because they are serialized into file metadata.
UNET_DEFAULT_TARGET_REPLACE = {"CrossAttention", "Attention", "GEGLU"}
UNET_EXTENDED_TARGET_REPLACE = {"ResnetBlock2D", "CrossAttention", "Attention", "GEGLU"}
TEXT_ENCODER_DEFAULT_TARGET_REPLACE = {"CLIPAttention"}
TEXT_ENCODER_EXTENDED_TARGET_REPLACE = {"CLIPAttention"}
DEFAULT_TARGET_REPLACE = UNET_DEFAULT_TARGET_REPLACE

Pair = Tuple[np.ndarray, np.ndarray]  # (up, down)


def save_safeloras_with_embeds(
    modelmap: Dict[str, Tuple[Sequence[Pair], Iterable[str]]],
    embeds: Dict[str, np.ndarray] = {},
    outpath: str = "./lora.safetensors",
    cast_fp16: bool = False,
) -> None:
    """Save LoRAs for multiple models plus TI embeds into one file.

    modelmap: {"model name": ([(up, down), ...] in site order, target_set)}
    Reference: lora.py:451-483. Fresh training saves use cast_fp16=True
    (the reference extracts as fp16, lora.py:400-421); conversion tools keep
    incoming dtypes so round-trips are byte-exact (golden fixtures exist in
    both F32 and F16).
    """
    weights: Dict[str, np.ndarray] = {}
    metadata: Dict[str, str] = {}

    def _cast(a):
        a = np.asarray(a)
        return a.astype(np.float16) if cast_fp16 else a

    for name, (pairs, target_replace_module) in modelmap.items():
        metadata[name] = json.dumps(list(target_replace_module))
        for i, (up, down) in enumerate(pairs):
            rank = int(np.shape(down)[0])
            metadata[f"{name}:{i}:rank"] = str(rank)
            weights[f"{name}:{i}:up"] = _cast(up)
            weights[f"{name}:{i}:down"] = _cast(down)

    for token, tensor in embeds.items():
        metadata[token] = EMBED_FLAG
        weights[token] = np.asarray(tensor)

    save_file(weights, outpath, metadata)


def save_safeloras(
    modelmap: Dict[str, Tuple[Sequence[Pair], Iterable[str]]],
    outpath: str = "./lora.safetensors",
) -> None:
    save_safeloras_with_embeds(modelmap, {}, outpath)


ParsedLora = Dict[str, Tuple[List[np.ndarray], List[int], List[str]]]


def parse_safeloras(safeloras) -> ParsedLora:
    """Group a loaded safetensors handle back into per-model weight lists.

    Returns {"model": (flat [up0, down0, up1, down1, ...], ranks, target)}.
    Reference: lora.py:538-596. Accepts any object with keys()/metadata()/
    get_tensor() (our SafetensorsFile, the safetensors package handle, or the
    in-memory join result).
    """
    loras: ParsedLora = {}
    metadata = safeloras.metadata()
    get_name = lambda k: k.split(":")[0]

    keys = sorted(safeloras.keys(), key=get_name)
    from itertools import groupby

    for name, module_keys in groupby(keys, get_name):
        info = metadata.get(name)
        if not info:
            raise ValueError(
                f"Tensor {name} has no metadata - is this a Lora safetensor?"
            )
        if info == EMBED_FLAG:  # textual inversion embed, handled separately
            continue

        target = json.loads(info)
        module_keys = list(module_keys)
        ranks = [4] * (len(module_keys) // 2)
        weights: List[Optional[np.ndarray]] = [None] * len(module_keys)
        for key in module_keys:
            _, idx, direction = key.split(":")
            idx = int(idx)
            ranks[idx] = int(metadata[f"{name}:{idx}:rank"])
            weights[idx * 2 + (1 if direction == "down" else 0)] = np.asarray(
                safeloras.get_tensor(key)
            )
        loras[name] = (weights, ranks, target)

    return loras


def parse_safeloras_embeds(safeloras) -> Dict[str, np.ndarray]:
    """Extract TI embeds: {token: array}. Reference: lora.py:599-617."""
    embeds: Dict[str, np.ndarray] = {}
    metadata = safeloras.metadata()
    for key in safeloras.keys():
        if metadata.get(key) == EMBED_FLAG:
            embeds[key] = np.asarray(safeloras.get_tensor(key))
    return embeds


def load_safeloras(path: str) -> ParsedLora:
    with SafetensorsFile(path) as f:
        return parse_safeloras(f)


def load_safeloras_embeds(path: str) -> Dict[str, np.ndarray]:
    with SafetensorsFile(path) as f:
        return parse_safeloras_embeds(f)


def load_safeloras_both(path: str):
    with SafetensorsFile(path) as f:
        return parse_safeloras(f), parse_safeloras_embeds(f)


def pairs_from_flat(weights: Sequence[np.ndarray]) -> List[Pair]:
    """[up0, down0, up1, down1, ...] -> [(up0, down0), ...]."""
    if len(weights) % 2:
        raise ValueError("flat LoRA list must have even length")
    return [(weights[2 * i], weights[2 * i + 1]) for i in range(len(weights) // 2)]


def flat_from_pairs(pairs: Sequence[Pair]) -> List[np.ndarray]:
    out: List[np.ndarray] = []
    for up, down in pairs:
        out.append(np.asarray(up))
        out.append(np.asarray(down))
    return out


class InMemorySafetensors:
    """Dict-backed stand-in for a safetensors handle (reference
    DummySafeTensorObject, lora_manager.py:74-87)."""

    def __init__(self, tensors: Dict[str, np.ndarray], metadata: Dict[str, str]):
        self.tensors = tensors
        self._metadata = metadata

    def keys(self):
        return self.tensors.keys()

    def metadata(self):
        return self._metadata

    def get_tensor(self, key):
        return self.tensors[key]


__all__ = [
    "EMBED_FLAG",
    "UNET_DEFAULT_TARGET_REPLACE",
    "UNET_EXTENDED_TARGET_REPLACE",
    "TEXT_ENCODER_DEFAULT_TARGET_REPLACE",
    "TEXT_ENCODER_EXTENDED_TARGET_REPLACE",
    "DEFAULT_TARGET_REPLACE",
    "save_safeloras",
    "save_safeloras_with_embeds",
    "parse_safeloras",
    "parse_safeloras_embeds",
    "load_safeloras",
    "load_safeloras_embeds",
    "load_safeloras_both",
    "pairs_from_flat",
    "flat_from_pairs",
    "InMemorySafetensors",
    "SafetensorsFile",
    "safe_open",
    "save_file",
    "load_file",
]
