"""Multi-LoRA runtime composition (reference lora_manager.py).

lora_join: concatenate N LoRA safetensors into one of rank sum(r_i) — downs
stacked on the rank axis, ups on the column axis — with TI tokens renamed to
<s{model}-{j}>.  LoRAManager patches a pipeline with the join and `tune()`s
per-source scales through a block-diagonal selector.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from .core.lora import lora_from_flat, set_lora_diag
from .formats.safetensors_io import (
    EMBED_FLAG,
    InMemorySafetensors,
    parse_safeloras,
    parse_safeloras_embeds,
    safe_open,
)


def lora_join(lora_safetensors: Sequence) -> tuple:
    """(total_tensor, total_metadata, ranklist, token_size_list) — reference
    lora_manager.py:13-72, numpy."""
    metadatas = [dict(s.metadata()) for s in lora_safetensors]
    _total_metadata: Dict[str, str] = {}
    total_metadata: Dict[str, str] = {}
    total_tensor: Dict[str, np.ndarray] = {}
    total_rank = 0
    ranklist: List[int] = []
    for md in metadatas:
        rankset = [int(v) for k, v in md.items() if k.endswith("rank")]
        assert len(set(rankset)) <= 1, "Rank should be the same per model"
        rank = rankset[0] if rankset else 0
        total_rank += rank
        _total_metadata.update(md)
        ranklist.append(rank)

    for k, v in _total_metadata.items():
        if v != EMBED_FLAG:
            total_metadata[k] = v

    tensorkeys = set()
    for s in lora_safetensors:
        tensorkeys.update(s.keys())

    for key in tensorkeys:
        if key.startswith("text_encoder") or key.startswith("unet"):
            tensorset = [np.asarray(s.get_tensor(key))
                         for s in lora_safetensors]
            if key.endswith("down"):
                t = np.concatenate(tensorset, axis=0)
                assert t.shape[0] == total_rank
            else:
                t = np.concatenate(tensorset, axis=1)
                assert t.shape[1] == total_rank
            total_tensor[key] = t
            total_metadata[":".join(key.split(":")[:-1]) + ":rank"] = str(
                total_rank)

    token_size_list: List[int] = []
    for idx, s in enumerate(lora_safetensors):
        tokens = sorted(k for k, v in s.metadata().items() if v == EMBED_FLAG)
        for jdx, token in enumerate(tokens):
            total_tensor[f"<s{idx}-{jdx}>"] = np.asarray(s.get_tensor(token))
            total_metadata[f"<s{idx}-{jdx}>"] = EMBED_FLAG
        token_size_list.append(len(tokens))

    return total_tensor, total_metadata, ranklist, token_size_list


class LoRAManager:
    """Patch a pipeline with N joined LoRAs and tune per-LoRA scales at
    inference time (reference lora_manager.py:90-144)."""

    def __init__(self, lora_paths_list: List[str], pipe):
        self.lora_paths_list = lora_paths_list
        self.pipe = pipe
        self._setup()

    def _setup(self):
        handles = [safe_open(p) for p in self.lora_paths_list]
        total_tensor, total_metadata, self.ranklist, self.token_size_list = \
            lora_join(handles)
        for h in handles:
            h.close()
        joined = InMemorySafetensors(total_tensor, total_metadata)
        loras = parse_safeloras(joined)
        if "unet" in loras:
            w, ranks, target = loras["unet"]
            self.pipe.lora_unet = lora_from_flat(
                w, self.pipe.unet_sites(set(target)))
        if "text_encoder" in loras:
            w, ranks, target = loras["text_encoder"]
            self.pipe.lora_text = lora_from_flat(
                w, self.pipe.text_sites(set(target)))
        self.pipe.apply_ti(parse_safeloras_embeds(joined), idempotent=True)

    def tune(self, scales: Sequence[float]):
        assert len(scales) == len(self.ranklist), (
            "Scale list should be the same length as ranklist")
        diags = []
        for scale, rank in zip(scales, self.ranklist):
            diags += [scale] * rank
        if self.pipe.lora_unet is not None:
            self.pipe.lora_unet = set_lora_diag(self.pipe.lora_unet,
                                                jnp.asarray(diags))

    def prompt(self, prompt: str) -> str:
        if prompt is not None:
            for idx, tok_size in enumerate(self.token_size_list):
                prompt = prompt.replace(
                    f"<{idx + 1}>",
                    "".join(f"<s{idx}-{jdx}>" for jdx in range(tok_size)))
        return prompt
