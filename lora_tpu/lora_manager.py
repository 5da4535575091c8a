"""Multi-LoRA runtime composition.

Feature parity with the reference's lora_manager.py (lora_join + LoRAManager),
built on this repo's own primitives: each input file is parsed into per-model
LoRA pytrees, concatenated with :func:`core.lora.join_loras` (downs stacked on
the rank axis, ups on the column axis), and re-serialized through the same
``build_safeloras`` assembly the save path uses. TI tokens from file *i* are
renamed ``<s{i}-{j}>`` so joined adapters keep distinct vocabularies; the
``LoRAManager.tune`` knob routes per-source scales through a block-diagonal
rank selector.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .core.lora import join_loras, lora_from_flat, lora_to_pairs, set_lora_diag
from .formats.safetensors_io import (
    EMBED_FLAG,
    InMemorySafetensors,
    build_safeloras,
    pairs_from_flat,
    parse_safeloras,
    parse_safeloras_embeds,
    safe_open,
)


def _as_tree(flat: Sequence[np.ndarray]) -> dict:
    """Wrap an on-disk flat weight list as a site-indexed LoRA pytree so the
    core combinators can operate on it without model configs."""
    pairs = pairs_from_flat(list(flat))
    return {
        "sites": {
            f"{i:05d}": {"up": jnp.asarray(np.asarray(up)),
                         "down": jnp.asarray(np.asarray(down))}
            for i, (up, down) in enumerate(pairs)
        },
        "scale": jnp.asarray(1.0, jnp.float32),
    }


def _tree_to_pairs(tree: dict) -> List[Tuple[np.ndarray, np.ndarray]]:
    return [
        (np.asarray(entry["up"]), np.asarray(entry["down"]))
        for _, entry in sorted(tree["sites"].items())
    ]


def _renamed_embeds(handles: Sequence) -> Tuple[Dict[str, np.ndarray], List[int]]:
    """TI tokens of file i become <s{i}-{j}> (j over the file's sorted tokens);
    returns the renamed embed dict and the per-file token counts used by
    LoRAManager.prompt."""
    embeds: Dict[str, np.ndarray] = {}
    counts: List[int] = []
    for i, handle in enumerate(handles):
        file_embeds = parse_safeloras_embeds(handle)
        for j, token in enumerate(sorted(file_embeds)):
            embeds[f"<s{i}-{j}>"] = file_embeds[token]
        counts.append(len(file_embeds))
    return embeds, counts


def lora_join(lora_safetensors: Sequence) -> tuple:
    """Join N LoRA files into one rank-sum adapter.

    Returns ``(tensors, metadata, ranklist, token_size_list)`` in the schema
    the reference produces (lora_manager.py:13-72) so joined files interop:
    every site's rank metadata is the summed rank, targets/token flags carry
    over, embeds are renamed per file.
    """
    parsed = [parse_safeloras(h) for h in lora_safetensors]

    # one uniform rank per file (across all its models) is required for
    # block-diagonal tuning to be meaningful
    ranklist: List[int] = []
    for per_model in parsed:
        ranks = {r for _, rs, _ in per_model.values() for r in rs}
        if len(ranks) > 1:
            raise ValueError("Rank should be the same per model")
        ranklist.append(ranks.pop() if ranks else 0)

    models = sorted({m for per_model in parsed for m in per_model})
    modelmap: Dict[str, Tuple[list, list]] = {}
    for model in models:
        missing = [i for i, p in enumerate(parsed) if model not in p]
        if missing:
            raise ValueError(
                f"model {model!r} is absent from input file(s) {missing}; "
                "all joined files must cover the same models"
            )
        trees = [_as_tree(p[model][0]) for p in parsed]
        joined, _ = join_loras(trees)
        target = parsed[-1][model][2]  # later files win, like a dict update
        modelmap[model] = (_tree_to_pairs(joined), target)

    embeds, token_size_list = _renamed_embeds(lora_safetensors)
    tensors, metadata = build_safeloras(modelmap, embeds)
    return tensors, metadata, ranklist, token_size_list


class LoRAManager:
    """Serve N LoRAs through one pipeline patch, with per-source runtime
    scaling (reference LoRAManager semantics: join once, then ``tune`` builds
    a block-diagonal selector and ``prompt`` rewrites <1>/<2> token groups)."""

    def __init__(self, lora_paths_list: List[str], pipe):
        self.lora_paths_list = lora_paths_list
        self.pipe = pipe
        self._patch()

    def _patch(self):
        handles = [safe_open(p) for p in self.lora_paths_list]
        try:
            tensors, metadata, self.ranklist, self.token_size_list = lora_join(
                handles)
        finally:
            for h in handles:
                h.close()
        joined = InMemorySafetensors(tensors, metadata)
        loras = parse_safeloras(joined)
        if "unet" in loras:
            flat, _, target = loras["unet"]
            self.pipe.lora_unet = lora_from_flat(
                flat, self.pipe.unet_sites(set(target)))
        if "text_encoder" in loras:
            flat, _, target = loras["text_encoder"]
            self.pipe.lora_text = lora_from_flat(
                flat, self.pipe.text_sites(set(target)))
        self.pipe.apply_ti(parse_safeloras_embeds(joined), idempotent=True)

    def tune(self, scales: Sequence[float]):
        """Per-source alpha: scale i gates the rank block contributed by
        file i, via the diagonal selector."""
        if len(scales) != len(self.ranklist):
            raise ValueError(
                f"need one scale per joined LoRA "
                f"({len(self.ranklist)}), got {len(scales)}"
            )
        diag = np.repeat(np.asarray(scales, np.float32),
                         np.asarray(self.ranklist, np.int64))
        if self.pipe.lora_unet is not None:
            self.pipe.lora_unet = set_lora_diag(self.pipe.lora_unet,
                                                jnp.asarray(diag))

    def prompt(self, prompt: str) -> str:
        """Rewrite <1>, <2>, ... placeholders to the renamed token groups of
        the corresponding source file."""
        if prompt is None:
            return prompt
        for i, n_tokens in enumerate(self.token_size_list):
            group = "".join(f"<s{i}-{j}>" for j in range(n_tokens))
            prompt = prompt.replace(f"<{i + 1}>", group)
        return prompt
