"""HF diffusers-layout export/import round-trip."""

import jax
import numpy as np

from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.models.hf_import import load_pipeline_params, save_pipeline_params
from lora_tpu.pipelines.sd import StableDiffusionPipeline


def test_pipeline_dir_roundtrip(tmp_path):
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    d = str(tmp_path / "sd")
    save_pipeline_params(pipe, d)
    unet_p, text_p, vae_p, (ucfg, tcfg, vcfg) = load_pipeline_params(d)
    assert ucfg == TINY_UNET
    assert vcfg == TINY_VAE
    assert tcfg.hidden_size == TINY_TEXT.hidden_size
    assert set(unet_p) == set(pipe.unet_params)
    for k in list(pipe.unet_params)[:20]:
        np.testing.assert_array_equal(np.asarray(unet_p[k]),
                                      np.asarray(pipe.unet_params[k]))
    # a reloaded pipe produces identical images at matched latents
    pipe2 = StableDiffusionPipeline.from_pretrained(d, tokenizer=pipe.tokenizer)
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(1))
    a = pipe("z", num_inference_steps=2, height=64, width=64, latents=lat)
    b = pipe2("z", num_inference_steps=2, height=64, width=64, latents=lat)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_vae_legacy_attention_key_mapping(tmp_path):
    """Old-diffusers VAE checkpoints use query/key/value/proj_attn names."""
    import json
    import os

    from lora_tpu.formats.reader import save_file
    from lora_tpu.models.hf_import import load_vae
    from lora_tpu.models.vae import init_vae

    params = init_vae(TINY_VAE, jax.random.PRNGKey(3))
    legacy = {}
    for k, v in params.items():
        v = np.asarray(v, np.float32)
        if ".attentions.0.to_q." in k:
            k = k.replace(".to_q.", ".query.")
        elif ".attentions.0.to_k." in k:
            k = k.replace(".to_k.", ".key.")
        elif ".attentions.0.to_v." in k:
            k = k.replace(".to_v.", ".value.")
        elif ".attentions.0.to_out.0." in k:
            k = k.replace(".to_out.0.", ".proj_attn.")
            if v.ndim == 2:  # legacy stores 1x1 conv weight
                v = v[:, :, None, None]
        legacy[k] = v
    d = str(tmp_path / "vae")
    os.makedirs(d)
    save_file(legacy, os.path.join(d, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"block_out_channels": list(TINY_VAE.block_out_channels),
                   "norm_num_groups": TINY_VAE.norm_num_groups}, f)
    loaded, cfg = load_vae(d)
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      np.asarray(params[k]))
