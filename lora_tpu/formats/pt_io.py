"""Legacy torch ``.pt`` interop (flat interleaved [up0, down0, ...] lists and
TI embed dicts). torch (CPU) is used strictly at the file boundary; nothing
in the compute path touches it.

Reference formats: save_lora_weight (lora.py:424-436) writes a flat list of
fp16 CPU tensors; TI saves a {token: tensor} dict (lora.py:1058-1070).
Path conventions _text_lora_path / _ti_lora_path: lora.py:889-896.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

Pair = Tuple[np.ndarray, np.ndarray]


def _torch():
    import torch

    return torch


def text_lora_path(path: str) -> str:
    assert path.endswith(".pt"), "Only .pt files are supported"
    return ".".join(path.split(".")[:-1] + ["text_encoder", "pt"])


def ti_lora_path(path: str) -> str:
    assert path.endswith(".pt"), "Only .pt files are supported"
    return ".".join(path.split(".")[:-1] + ["ti", "pt"])


def save_lora_pt(pairs: Sequence[Pair], path: str) -> None:
    """Write the reference's flat interleaved fp16 list.

    Elements are stored as nn.Parameter: the reference's resume path
    (inject_trainable_lora(loras=path), lora.py:301-303) assigns list items
    RAW to a Parameter attribute, which torch only accepts for Parameters —
    plain-tensor lists (what the reference's own save emits from a CUDA
    model) crash its loader. Parameter elements load cleanly through both
    its inject-resume and monkeypatch paths, and through load_lora_pt."""
    torch = _torch()
    weights = []
    for up, down in pairs:
        weights.append(torch.nn.Parameter(
            torch.from_numpy(np.asarray(up, dtype=np.float16)),
            requires_grad=False))
        weights.append(torch.nn.Parameter(
            torch.from_numpy(np.asarray(down, dtype=np.float16)),
            requires_grad=False))
    torch.save(weights, path)


def load_lora_pt(path: str) -> List[np.ndarray]:
    """Read a flat [up0, down0, ...] list to float32 numpy."""
    torch = _torch()
    weights = torch.load(path, map_location="cpu", weights_only=False)
    return [w.detach().float().numpy() for w in weights]


def save_lora_json(pairs: Sequence[Pair], path: str) -> None:
    """Debug-format dump: flat interleaved [up0, down0, ...] as nested JSON
    lists (reference save_lora_as_json, lora.py:439-448)."""
    import json

    weights = []
    for up, down in pairs:
        weights.append(np.asarray(up, dtype=np.float32).tolist())
        weights.append(np.asarray(down, dtype=np.float32).tolist())
    with open(path, "w") as f:
        json.dump(weights, f)


def load_lora_json(path: str) -> List[np.ndarray]:
    import json

    with open(path) as f:
        return [np.asarray(w, dtype=np.float32) for w in json.load(f)]


def save_ti_pt(embeds: Dict[str, np.ndarray], path: str) -> None:
    torch = _torch()
    torch.save(
        {tok: torch.from_numpy(np.asarray(v, dtype=np.float32)) for tok, v in embeds.items()},
        path,
    )


def load_ti_pt(path: str) -> Dict[str, np.ndarray]:
    torch = _torch()
    d = torch.load(path, map_location="cpu", weights_only=False)
    return {tok: v.detach().float().numpy() for tok, v in d.items()}


def save_a1111_embedding(
    token: str, embed: np.ndarray, path: str, name: str = "embed"
) -> None:
    """A1111-style textual embedding .pt (reference cli_lora_add.py:141-166):
    {"string_to_token": {"*": 265}, "string_to_param": {"*": tensor[1, dim]}}.
    """
    torch = _torch()
    t = torch.from_numpy(np.asarray(embed, dtype=np.float32)).unsqueeze(0)
    torch.save(
        {
            "string_to_token": {"*": 265},
            "string_to_param": {"*": t},
            "name": name,
            "step": 0,
            "sd_checkpoint": "custom",
            "sd_checkpoint_name": "custom",
        },
        path,
    )


def save_a1111_multi_embedding(
    embeds: Dict[str, np.ndarray], path: str, name: str = "embed"
) -> None:
    """Multi-vector A1111 embedding: all learned vectors stacked under "*"
    in sorted-token order (the same convention lora_add upl-ckpt-v2 uses for
    its sidecar .pt — the webui expands the file's name to all rows).  An
    extra "lora_tpu_tokens" key records row ownership so load_a1111_embedding
    can reconstruct the exact per-token dict; A1111 ignores unknown keys."""
    torch = _torch()
    toks = sorted(embeds)
    cat = torch.stack([
        torch.from_numpy(np.asarray(embeds[t], np.float32)) for t in toks])
    torch.save(
        {
            "string_to_token": {"*": 265},
            "string_to_param": {"*": cat},
            "name": name,
            "step": 0,
            "sd_checkpoint": "custom",
            "sd_checkpoint_name": "custom",
            "lora_tpu_tokens": {t: i for i, t in enumerate(toks)},
        },
        path,
    )


def load_a1111_embedding(path: str) -> Tuple[str, Dict[str, np.ndarray]]:
    """Read an A1111 embedding .pt back to (name, {token: vector}).

    Files we wrote carry "lora_tpu_tokens" and round-trip exactly; foreign
    webui files fall back to naming rows after the embedding itself
    (name / name:1 / name:2 ... — the webui's trigger-word semantics)."""
    torch = _torch()
    d = torch.load(path, map_location="cpu", weights_only=False)
    cat = d["string_to_param"]["*"].detach().float().numpy()
    if cat.ndim == 1:
        cat = cat[None]
    name = d.get("name", "embed")
    tokens = d.get("lora_tpu_tokens")
    if tokens:
        return name, {t: cat[i] for t, i in tokens.items()}
    return name, {name if i == 0 else f"{name}:{i}": cat[i]
                  for i in range(cat.shape[0])}
