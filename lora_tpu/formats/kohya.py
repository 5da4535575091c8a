"""kohya-ss / AUTOMATIC1111-webui LoRA format interop.

The reference repo predates the community's convergence on the kohya key
schema (`lora_unet_<module>_<path>.lora_down.weight` / `.lora_up.weight` /
`.alpha`); users migrating from cloneofsimo-format files routinely need
both directions, so this module converts between the formats losslessly
for the module sets both cover (attention + GEGLU linears and, for
extended LoRAs, resnet convs). LoCon files — kohya's conv_dim targets
over every Linear/Conv2d in Transformer2DModel/ResnetBlock2D/
{Down,Up}sample2D, optionally CP-decomposed — load fully against the
LoCon site supersets (core/sites.unet_locon_sites). This module is the
PAIRS loader: it keeps the (up, down) factorization and rejects any other
decomposition; LoHa/LoKr/IA3 files load through formats/lycoris.py (as
exact full-rank delta entries), which patch_pipe auto-dispatches to.

Key mapping: our site names ARE diffusers module paths (core/sites.py),
so the kohya key is `lora_unet_` (or `lora_te_`) + the path with dots
replaced by underscores. `.alpha` stores the site's rank (multiplier
alpha/rank = 1.0) and the runtime scale is folded into `lora_up` exactly
as the reference's realize_as_lora does at save (lora.py:60-61); on load,
files with alpha != rank get alpha/rank folded into the up weights, so
sampling matches webui's effective multiplier.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..core.lora import LoraTree, lora_from_pairs, lora_to_pairs
from ..core.sites import Site
from .reader import SafetensorsFile, save_file

_PREFIX = {"unet": "lora_unet", "text_encoder": "lora_te"}


def kohya_key(model: str, site_name: str) -> str:
    return _PREFIX[model] + "_" + site_name.replace(".", "_")


def save_kohya(
    path: str,
    *,
    lora_unet: Optional[LoraTree] = None,
    unet_sites: Optional[Sequence[Site]] = None,
    lora_text: Optional[LoraTree] = None,
    text_sites: Optional[Sequence[Site]] = None,
    dtype=np.float16,
) -> None:
    tensors: Dict[str, np.ndarray] = {}
    for model, lora, sites in (("unet", lora_unet, unet_sites),
                               ("text_encoder", lora_text, text_sites)):
        if lora is None:
            continue
        for site, (up, down) in zip(sites, lora_to_pairs(lora, sites)):
            base = kohya_key(model, site.name)
            tensors[base + ".lora_down.weight"] = down.astype(dtype)
            tensors[base + ".lora_up.weight"] = up.astype(dtype)
            tensors[base + ".alpha"] = np.asarray(float(down.shape[0]),
                                                  dtype)
    save_file(tensors, path, {"library": "lora_tpu"})


def _site_index(model: str, sites: Sequence[Site]) -> Dict[str, Site]:
    return {kohya_key(model, s.name): s for s in sites}


def _compose_cp_mid(base: str, site: Site, mid: np.ndarray,
                    down: np.ndarray) -> np.ndarray:
    """Fold a LoCon CP-decomposed conv into our two-factor form.

    LyCORIS CP convs factor the delta as up(1x1) . mid(kxk, r->r) .
    down(1x1, in->r); our runtime is down(kxk, original geometry) .
    up(1x1) (core/lora.lora_delta_conv). Because a 1x1 conv is pure channel
    mixing, mid . down composes EXACTLY into one kxk conv:
    down'[r, in, kh, kw] = sum_s mid[r, s, kh, kw] * down[s, in] — no
    approximation, so CP files load bit-faithfully (up to fp32 rounding)."""
    if site.kind != "conv":
        raise ValueError(
            f"kohya module {base!r} has a lora_mid factor but maps to a "
            f"linear site; CP decomposition only applies to convs")
    if down.ndim != 4 or down.shape[2:] != (1, 1) or mid.ndim != 4:
        raise ValueError(
            f"kohya module {base!r}: unexpected CP factor shapes "
            f"down={down.shape} mid={mid.shape} (want down 1x1, mid kxk)")
    if mid.shape[1] != down.shape[0] or mid.shape[2:] != site.kernel:
        raise ValueError(
            f"kohya module {base!r}: CP factors disagree with the site "
            f"geometry (mid {mid.shape}, down {down.shape}, "
            f"kernel {site.kernel})")
    return np.einsum("rskh,sc->rckh", mid, down[:, :, 0, 0])


def load_kohya(
    path: str,
    *,
    unet_sites: Optional[Sequence[Site]] = None,
    text_sites: Optional[Sequence[Site]] = None,
    dtype=np.float32,
) -> Tuple[Optional[LoraTree], Optional[LoraTree]]:
    """Returns (lora_unet, lora_text); a model whose sites are not given
    (or that has no keys in the file) comes back None.

    LoCon files load fully when given the LoCon site supersets
    (core/sites.unet_locon_sites / text_encoder_locon_sites) — including
    CP-decomposed convs, whose mid factor is composed exactly into the
    down conv (_compose_cp_mid). Unknown keys — modules outside the given
    site sets, or LoHa/LoKr factor tensors — raise with the key names so
    silent partial loads cannot happen."""
    with SafetensorsFile(path) as f:
        keys = list(f.keys())
        groups: Dict[str, Dict[str, np.ndarray]] = {}
        for k in keys:
            base, _, leaf = k.rpartition(".")
            if leaf == "weight":
                base, _, which = base.rpartition(".")
                groups.setdefault(base, {})[which] = f.get_tensor(k)
            elif leaf == "alpha":
                groups.setdefault(base, {})["alpha"] = f.get_tensor(k)
            else:
                raise ValueError(f"unrecognized kohya key {k!r}")

        # a KNOWN site can still carry sub-tensors we don't implement —
        # LoCon's CP '<site>.lora_mid.weight' is composed below; anything
        # else (LoHa/LoKr factors, etc.) is rejected so silent partial
        # loads cannot happen.
        for base, g in groups.items():
            extra = sorted(set(g) - {"lora_up", "lora_down", "lora_mid",
                                     "alpha"})
            if extra:
                raise ValueError(
                    f"kohya module {base!r} has unsupported sub-tensors "
                    f"{extra} (LyCORIS decomposition?); refusing a "
                    f"partial load")

        # every base must belong to one of the two known model prefixes;
        # anything else (e.g. SDXL's lora_te1_/lora_te2_) would be silently
        # skipped by both model passes below — reject instead
        foreign = [b for b in groups
                   if not any(b.startswith(p + "_")
                              for p in _PREFIX.values())]
        if foreign:
            raise ValueError(
                f"kohya file has modules under unknown prefixes "
                f"(SDXL/unsupported model?): {sorted(foreign)[:5]}"
                f"{'...' if len(foreign) > 5 else ''}")

        out = {}
        for model, sites in (("unet", unet_sites),
                             ("text_encoder", text_sites)):
            if sites is None:
                out[model] = None
                continue
            index = _site_index(model, sites)
            present = {b: g for b, g in groups.items() if b in index}
            if not present:
                out[model] = None
                continue
            unknown = [b for b in groups
                       if b.startswith(_PREFIX[model] + "_")
                       and b not in index]
            if unknown:
                raise ValueError(
                    f"kohya file has {model} modules outside the known "
                    f"site set (LoCon/unsupported targets?): "
                    f"{sorted(unknown)[:5]}{'...' if len(unknown) > 5 else ''}")
            out[model] = _tree_from_groups(present, index, sites, dtype)
    return out["unet"], out["text_encoder"]


def _tree_from_groups(present: Dict[str, Dict[str, np.ndarray]],
                      index: Dict[str, Site], sites: Sequence[Site],
                      dtype) -> LoraTree:
    """Build a LoRA tree from grouped (lora_up/lora_down/mid/alpha)
    tensors keyed by kohya module name. kohya trainers cover varying
    module subsets (attn-only, attn+ff, ...); the LoRA pytree applies
    wherever a site is present, so partial coverage loads fine."""
    by_name = {index[b].name: b for b in present}
    pairs, matched_sites = [], []
    for s in sites:
        base = by_name.get(s.name)
        if base is None:
            continue
        g = present[base]
        up = np.asarray(g["lora_up"], np.float32)
        down = np.asarray(g["lora_down"], np.float32)
        if "lora_mid" in g:
            down = _compose_cp_mid(
                base, s, np.asarray(g["lora_mid"], np.float32), down)
        alpha = float(np.asarray(g.get("alpha", down.shape[0])))
        up = up * (alpha / down.shape[0])  # webui multiplier
        pairs.append((up, down))
        matched_sites.append(s)
    return lora_from_pairs(pairs, matched_sites, dtype=dtype)


# ---------------------------------------------------------------------------
# SDXL flavor: lora_te1_/lora_te2_ text prefixes and LDM unet module names
# ---------------------------------------------------------------------------

_PREFIX_XL = {"unet": "lora_unet", "text_encoder": "lora_te1",
              "text_encoder_2": "lora_te2"}


def _xl_unet_index(sites: Sequence[Site], cfg) -> Dict[str, Site]:
    """kohya's SDXL trainer names unet modules by the ORIGINAL LDM layout
    (input_blocks/middle_block/output_blocks — sd-scripts trains its own
    sdxl_original_unet), unlike SD1.x kohya keys which use diffusers
    paths. The diffusers->LDM module map is generated from the config
    (formats/ckpt_export.unet_key_map — the same table the CompVis
    exporter uses), so any site we know gets its LDM spelling here."""
    from .ckpt_export import unet_key_map

    km = sorted(unet_key_map(cfg).items(), key=lambda kv: -len(kv[0]))
    idx: Dict[str, Site] = {}
    for s in sites:
        for src, dst in km:
            if s.name == src or s.name.startswith(src + "."):
                ldm = dst + s.name[len(src):]
                break
        else:
            raise KeyError(f"no LDM name mapping for unet site {s.name!r}")
        idx["lora_unet_" + ldm.replace(".", "_")] = s
    return idx


def _xl_index(model: str, sites: Sequence[Site], unet_cfg) -> Dict[str, Site]:
    if model == "unet":
        return _xl_unet_index(sites, unet_cfg)
    return {_PREFIX_XL[model] + "_" + s.name.replace(".", "_"): s
            for s in sites}


def save_kohya_xl(
    path: str,
    *,
    unet_cfg,
    lora_unet: Optional[LoraTree] = None,
    unet_sites: Optional[Sequence[Site]] = None,
    lora_text: Optional[LoraTree] = None,
    text_sites: Optional[Sequence[Site]] = None,
    lora_text2: Optional[LoraTree] = None,
    text2_sites: Optional[Sequence[Site]] = None,
    dtype=np.float16,
) -> None:
    """Write the SDXL kohya schema (webui-loadable): LDM unet names,
    lora_te1_/lora_te2_ text-encoder prefixes."""
    tensors: Dict[str, np.ndarray] = {}
    for model, lora, sites in (("unet", lora_unet, unet_sites),
                               ("text_encoder", lora_text, text_sites),
                               ("text_encoder_2", lora_text2, text2_sites)):
        if lora is None:
            continue
        index = _xl_index(model, sites, unet_cfg)
        by_name = {s.name: k for k, s in index.items()}
        for site, (up, down) in zip(sites, lora_to_pairs(lora, sites)):
            base = by_name[site.name]
            tensors[base + ".lora_down.weight"] = down.astype(dtype)
            tensors[base + ".lora_up.weight"] = up.astype(dtype)
            tensors[base + ".alpha"] = np.asarray(float(down.shape[0]),
                                                  dtype)
    save_file(tensors, path, {"library": "lora_tpu"})


def is_kohya_xl(keys) -> bool:
    """True if any key carries an SDXL marker: te1/te2 prefixes or LDM
    unet block names (SD1.x kohya unet keys use diffusers down_blocks/
    up_blocks/mid_block paths instead)."""
    for k in keys:
        if k.startswith(("lora_te1_", "lora_te2_")):
            return True
        if k.startswith(("lora_unet_input_blocks_",
                         "lora_unet_middle_block_",
                         "lora_unet_output_blocks_")):
            return True
    return False


def load_kohya_xl(
    path: str,
    *,
    unet_cfg,
    unet_sites: Optional[Sequence[Site]] = None,
    text_sites: Optional[Sequence[Site]] = None,
    text2_sites: Optional[Sequence[Site]] = None,
    dtype=np.float32,
) -> Tuple[Optional[LoraTree], Optional[LoraTree], Optional[LoraTree]]:
    """Load an SDXL kohya LoRA: returns (lora_unet, lora_te1, lora_te2).
    Same loud-failure contract as load_kohya: unknown sub-tensors,
    unknown prefixes, and modules outside the given site sets all raise."""
    with SafetensorsFile(path) as f:
        groups: Dict[str, Dict[str, np.ndarray]] = {}
        for k in f.keys():
            base, _, leaf = k.rpartition(".")
            if leaf == "weight":
                base, _, which = base.rpartition(".")
                groups.setdefault(base, {})[which] = f.get_tensor(k)
            elif leaf == "alpha":
                groups.setdefault(base, {})["alpha"] = f.get_tensor(k)
            else:
                raise ValueError(f"unrecognized kohya key {k!r}")
        for base, g in groups.items():
            extra = sorted(set(g) - {"lora_up", "lora_down", "lora_mid",
                                     "alpha"})
            if extra:
                raise ValueError(
                    f"kohya module {base!r} has unsupported sub-tensors "
                    f"{extra} (LyCORIS decomposition?); refusing a "
                    f"partial load")
        foreign = [b for b in groups
                   if not any(b.startswith(p + "_")
                              for p in _PREFIX_XL.values())]
        if foreign:
            raise ValueError(
                f"SDXL kohya file has modules under unknown prefixes: "
                f"{sorted(foreign)[:5]}{'...' if len(foreign) > 5 else ''}")

        out = {}
        for model, sites in (("unet", unet_sites),
                             ("text_encoder", text_sites),
                             ("text_encoder_2", text2_sites)):
            if sites is None:
                out[model] = None
                continue
            index = _xl_index(model, sites, unet_cfg)
            present = {b: g for b, g in groups.items() if b in index}
            if not present:
                out[model] = None
                continue
            unknown = [b for b in groups
                       if b.startswith(_PREFIX_XL[model] + "_")
                       and b not in index]
            if unknown:
                raise ValueError(
                    f"SDXL kohya file has {model} modules outside the "
                    f"known site set: {sorted(unknown)[:5]}"
                    f"{'...' if len(unknown) > 5 else ''}")
            out[model] = _tree_from_groups(present, index, sites, dtype)
    return out["unet"], out["text_encoder"], out["text_encoder_2"]
