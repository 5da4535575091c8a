"""`lora_distill` — SVD-distill a full fine-tune into a LoRA
(reference cli_svd.py:95-146). Runs the SVDs on-device (jnp.linalg.svd)."""

from __future__ import annotations

from ..core.save import save_all
from ..core.svd import svd_distill
from ..formats.safetensors_io import (
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    UNET_EXTENDED_TARGET_REPLACE,
)
from ._fire import fire


def svd_distill_cli(
    target_model: str,
    base_model: str,
    rank: int = 4,
    clamp_quantile: float = 0.99,
    device: str = "tpu",  # accepted for recipe compat; jax picks the backend
    save_path: str = "svd_distill.safetensors",
    extended: bool = False,
    locon: bool = False,
    from_lora: bool = False,
):
    """`--locon` distills over the full kohya/LoCon module superset (every
    Linear/Conv2d in transformer, resnet, and resampler blocks + CLIP MLP)
    and writes a kohya-schema file — the reference-format file cannot
    express those sites, and LoCon is a kohya-ecosystem concept. Beyond
    cli_svd.py: the reference cannot produce full-conv distillations.

    `--from_lora` treats TARGET_MODEL as a kohya/LyCORIS-schema
    .safetensors adapter instead of a diffusers dir: the file is loaded
    against BASE_MODEL (full-rank LoHa/LoKr/IA3/DoRA/diag-OFT compositions
    included), collapsed into the base weights, and re-distilled at the
    requested rank — a one-command converter from any LyCORIS algorithm to
    a plain (up, down) LoRA (reference schema, or kohya with --locon).

    SDXL bases (dirs with a text_encoder_2) are autodetected: both text
    encoders distill and the artifact goes out in the kohya-XL schema;
    --from_lora then accepts kohya-XL / LyCORIS-XL adapters."""
    from ..core.sites import (
        text_encoder_locon_sites,
        text_encoder_lora_sites,
        unet_locon_sites,
        unet_lora_sites,
    )
    from ..models.hf_import import load_pipeline_params

    del device
    if locon and extended:
        raise ValueError(
            "--extended and --locon are conflicting target flags: locon "
            "already covers the extended (resnet/conv) sites via the kohya "
            "schema; pass exactly one")
    base_unet, base_text, _, (ucfg, tcfg, _) = load_pipeline_params(base_model)
    # SDXL bases (text_time UNets) distill over both text encoders and
    # save in the kohya-XL schema — the reference format predates SDXL
    is_xl = ucfg.addition_embed_type == "text_time"
    base_text2 = t2cfg = None
    if is_xl:
        import os

        from ..models.hf_import import load_text_encoder

        base_text2, t2cfg = load_text_encoder(
            os.path.join(base_model, "text_encoder_2"))
    if from_lora:
        from ..core.lora import collapse_lora
        from ..formats.kohya import is_kohya_xl, load_kohya, load_kohya_xl
        from ..formats.lycoris import (
            is_lycoris,
            load_lycoris,
            load_lycoris_xl,
        )
        from ..formats.reader import SafetensorsFile

        with SafetensorsFile(target_model) as f:
            keys = list(f.keys())
        if not any(k.startswith(("lora_unet_", "lora_te_", "lora_te1_",
                                 "lora_te2_")) for k in keys):
            raise ValueError(
                "--from_lora expects a kohya/LyCORIS-schema .safetensors "
                "adapter (lora_unet_*/lora_te*_ keys); reference-schema "
                "files are already plain (up, down) pairs")
        if is_xl != is_kohya_xl(keys):
            raise ValueError(
                f"--from_lora adapter schema ({'XL' if is_kohya_xl(keys) else 'SD1.x'}) "
                f"does not match the base model family "
                f"({'XL' if is_xl else 'SD1.x'})")
        u_all = unet_locon_sites(ucfg)
        t_all = text_encoder_locon_sites(tcfg)
        lt2 = None
        if is_xl:
            t2_all = text_encoder_locon_sites(t2cfg)
            if is_lycoris(keys):
                lu, lt, lt2 = load_lycoris_xl(
                    target_model, unet_cfg=ucfg, unet_sites=u_all,
                    text_sites=t_all, text2_sites=t2_all,
                    unet_params=base_unet, text_params=base_text,
                    text2_params=base_text2)
            else:
                lu, lt, lt2 = load_kohya_xl(
                    target_model, unet_cfg=ucfg, unet_sites=u_all,
                    text_sites=t_all, text2_sites=t2_all)
        elif is_lycoris(keys):
            lu, lt = load_lycoris(target_model, unet_sites=u_all,
                                  text_sites=t_all, unet_params=base_unet,
                                  text_params=base_text)
        else:
            lu, lt = load_kohya(target_model, unet_sites=u_all,
                                text_sites=t_all)
        for mname, t in (("unet", lu), ("text_encoder", lt),
                         ("text_encoder_2", lt2)):
            if t and t.get("param_deltas"):
                raise ValueError(
                    f"--from_lora cannot convert this adapter: it carries "
                    f"{len(t['param_deltas'])} norm/bias param deltas on "
                    f"{mname} (LyCORIS norm/full modules) which plain "
                    f"LoRA cannot represent")
        tuned_unet = collapse_lora(base_unet, lu) if lu else base_unet
        tuned_text = collapse_lora(base_text, lt) if lt else base_text
        tuned_text2 = (collapse_lora(base_text2, lt2) if lt2
                       else base_text2)
    else:
        tuned_unet, tuned_text, _, _ = load_pipeline_params(target_model)
        if is_xl:
            import os

            tuned_text2, _ = load_text_encoder(
                os.path.join(target_model, "text_encoder_2"))

    if locon:
        usites = unet_locon_sites(ucfg)
        tsites = text_encoder_locon_sites(tcfg)
    else:
        # The reference injects extended targets but extracts/saves the
        # default set (cli_svd.py:112 + save_all default), so resnet factors
        # never reach the artifact; we compute exactly what we save.
        # --extended keeps them.
        unet_targets = (UNET_EXTENDED_TARGET_REPLACE if extended
                        else UNET_DEFAULT_TARGET_REPLACE)
        usites = unet_lora_sites(ucfg, unet_targets)
        tsites = text_encoder_lora_sites(tcfg)

    t2sites = None
    if is_xl:
        t2sites = (text_encoder_locon_sites(t2cfg) if locon
                   else text_encoder_lora_sites(t2cfg))

    print(f"SVD distilling {len(usites)} unet + {len(tsites)} text sites "
          f"at rank {rank}")
    lora_unet = svd_distill(base_unet, tuned_unet, usites, rank,
                            clamp_quantile)
    lora_text = svd_distill(base_text, tuned_text, tsites, rank,
                            clamp_quantile)

    if is_xl:
        from ..formats.kohya import save_kohya_xl

        lora_text2 = svd_distill(base_text2, tuned_text2, t2sites, rank,
                                 clamp_quantile)
        save_kohya_xl(save_path, unet_cfg=ucfg, lora_unet=lora_unet,
                      unet_sites=usites, lora_text=lora_text,
                      text_sites=tsites, lora_text2=lora_text2,
                      text2_sites=t2sites)
    elif locon:
        from ..formats.kohya import save_kohya

        save_kohya(save_path, lora_unet=lora_unet, unet_sites=usites,
                   lora_text=lora_text, text_sites=tsites)
    else:
        save_all(save_path, lora_unet=lora_unet, unet_sites=usites,
                 lora_text=lora_text, text_sites=tsites, save_ti=False,
                 target_replace_module_unet=unet_targets,
                 target_replace_module_text=TEXT_ENCODER_DEFAULT_TARGET_REPLACE)
    print(f"Saved to {save_path}")


def main():
    fire(svd_distill_cli)


if __name__ == "__main__":
    main()
