"""End-to-end hardware artifact proof (VERDICT r3 item 5).

Composes, in one run, the two things no single test combines:
  1. TRAIN ON REAL TPU HARDWARE through the actual `lora_db` CLI (not
     bench.py's AOT step loop): the BASELINE.json north-star recipe shape —
     800-step rank-4 DreamBooth LoRA, bf16, 512px, cached latents
     (run_lora_db_v5e8_2min.sh) — against a full-size random-init SD-1.5
     pipeline exported to a diffusers-layout directory so the CLI's real
     from_pretrained path is exercised.
  2. LOAD THE RESULTING ARTIFACT IN THE LIVE REFERENCE IMPLEMENTATION
     (/root/reference/lora_diffusion/lora.py imported via importlib):
     parse_safeloras on our file, monkeypatch_or_replace_lora onto a torch
     module matching the first unet site, tune_lora_scale sweep, and a
     numerical check that the injected delta equals up@down from the file.

Prints ONE JSON line:
  {"metric": "hw_artifact_proof", "train_wall_s": ..., "steps": ...,
   "single_chip": true, "reference_loaded": true, "delta_max_err": ...,
   "target": "800 steps < 120 s on v5e-8 (BASELINE.json)"}

Run on the real chip: `python hw_proof.py` (first compile ~3-6 min through
the tunnel; persistent cache makes re-runs fast). `--steps N` overrides the
800 for smoke runs.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import bench_common

METRIC = "hw_artifact_proof"
REF_DIR = "/root/reference/lora_diffusion"


def _export_random_sd15(path: str, tiny: bool = False) -> None:
    """Random-init full-size SD-1.5 pipeline -> diffusers-layout dir (fp16
    on disk) so lora_db's from_pretrained path loads it like real weights.
    tiny=True swaps in the test-size configs for a CPU smoke of the same
    mechanics."""
    import jax
    import jax.numpy as jnp

    from lora_tpu.models.hf_import import save_pipeline_params
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    kw = {}
    if tiny:
        from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
        kw = dict(unet_cfg=TINY_UNET, text_cfg=TINY_TEXT, vae_cfg=TINY_VAE)
    pipe = StableDiffusionPipeline.random_init(
        rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16, **kw)
    save_pipeline_params(pipe, path, fp16=True)
    # scheduler config (from_pretrained falls back to SD-1.5 defaults if
    # absent, but write it to exercise the full directory layout)
    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    with open(os.path.join(path, "scheduler", "scheduler_config.json"),
              "w") as f:
        json.dump({"_class_name": "DDPMScheduler",
                   "num_train_timesteps": 1000, "beta_start": 0.00085,
                   "beta_end": 0.012, "beta_schedule": "scaled_linear",
                   "set_alpha_to_one": False, "steps_offset": 1,
                   "prediction_type": "epsilon"}, f)


def _make_instance_dir(path: str) -> None:
    import numpy as np
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(path, f"{i}.png"))


def _train(model_dir: str, inst_dir: str, out_dir: str, steps: int,
           resolution: int = 512, tiny: bool = False) -> float:
    """Run the REAL CLI as a subprocess (what a user runs), return wall s."""
    env = {**os.environ,
           "LORA_TPU_ALLOW_HASHED_TOKENIZER": "1",  # no CLIP vocab on disk
           "LORA_TPU_COMPILE_CACHE": "/root/repo/.jax_cache"}
    if tiny:  # CPU smoke: the minimal env the CLI tests use
        env = {"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
               "JAX_PLATFORMS": "cpu", "HOME": "/root",
               "LORA_TPU_ALLOW_HASHED_TOKENIZER": "1",
               "LORA_TPU_COMPILE_CACHE":
               "/root/repo/tests/.jax_cache"}
    cmd = [sys.executable, "-m", "lora_tpu.cli.lora_db",
           "--pretrained_model_name_or_path", model_dir,
           "--instance_data_dir", inst_dir,
           "--output_dir", out_dir,
           "--instance_prompt", "a photo of sks dog",
           "--resolution", str(resolution),
           "--train_batch_size", "1",
           "--learning_rate", "1e-4",
           "--lr_scheduler", "constant",
           "--lora_rank", "4",
           "--max_train_steps", str(steps),
           "--save_steps", "0",
           "--mixed_precision", "bf16",
           "--cached_latents", "True",
           "--output_format", "safe"]
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                       text=True, timeout=3600)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        print(json.dumps({"metric": METRIC, "value": None,
                          "error": "lora_db failed: "
                          + (r.stderr or r.stdout)[-600:]}))
        sys.exit(1)
    return wall


def _reference_loads(artifact: str) -> dict:
    """Feed the TPU-trained file to the LIVE reference implementation."""
    import importlib.util

    import numpy as np
    import torch
    import torch.nn as nn

    spec = importlib.util.spec_from_file_location("_ref_lora",
                                                  f"{REF_DIR}/lora.py")
    ref = importlib.util.module_from_spec(spec)
    sys.modules["_ref_lora"] = ref
    spec.loader.exec_module(ref)

    from safetensors import safe_open
    f = safe_open(artifact, framework="pt")
    loras = ref.parse_safeloras(f)
    assert "unet" in loras, f"reference parsed models: {list(loras)}"
    weights, ranks, target = loras["unet"]
    assert all(r == 4 for r in ranks), f"ranks: {set(ranks)}"

    # a torch module matching the FIRST unet site's dims; the reference's
    # monkeypatch consumes pairs in _find_modules order, so pair 0 lands on
    # this one Linear
    up0 = weights[0].detach().float()
    down0 = weights[1].detach().float()
    d_out, r = up0.shape
    d_in = down0.shape[1]

    class CrossAttention(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = nn.Linear(d_in, d_out, bias=False)

    class Toy(nn.Module):
        def __init__(self):
            super().__init__()
            self.blk = CrossAttention()

    torch.manual_seed(0)
    toy = Toy()
    x = torch.randn(3, d_in)
    y_base = toy.blk.to_q(x)

    ref.monkeypatch_or_replace_lora(toy, [w.float() for w in weights],
                                    set(target), ranks)
    toy.eval()  # LoraInjectedLinear has dropout_p=0.1 (lora.py:34,56)
    ref.tune_lora_scale(toy, 0.0)
    y0 = toy.blk.to_q(x)
    ref.tune_lora_scale(toy, 1.0)
    y1 = toy.blk.to_q(x)

    base_err = (y0 - y_base).abs().max().item()  # scale 0 == base exactly
    want = x @ down0.t() @ up0.t()               # the file's own delta
    delta_err = ((y1 - y0) - want).abs().max().item()
    assert base_err < 1e-5, f"scale-0 output moved: {base_err}"
    assert delta_err < 1e-4, f"injected delta mismatch: {delta_err}"
    # the delta must be non-trivial (training actually moved the ups)
    moved = want.abs().max().item()
    return {"reference_loaded": True, "n_unet_pairs": len(weights) // 2,
            "target_set": sorted(target), "delta_max_err": delta_err,
            "trained_delta_magnitude": moved}


def main():
    steps = 800
    if "--steps" in sys.argv[1:]:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    tiny = "--tiny" in sys.argv[1:]  # CPU smoke of the same mechanics
    if tiny:
        import jax  # in-process override beats the sitecustomize pin

        jax.config.update("jax_platforms", "cpu")
    else:
        bench_common.require_backend_or_exit(METRIC)

    work = tempfile.mkdtemp(prefix="hw_proof_")
    try:
        model_dir = os.path.join(work, "sd15")
        inst_dir = os.path.join(work, "inst")
        out_dir = os.path.join(work, "out")
        print(f"exporting random-init SD-1.5 to {model_dir} ...",
              file=sys.stderr)
        _export_random_sd15(model_dir, tiny=tiny)
        _make_instance_dir(inst_dir)
        print(f"training {steps} steps via lora_db CLI ...", file=sys.stderr)
        wall = _train(model_dir, inst_dir, out_dir, steps,
                      resolution=64 if tiny else 512, tiny=tiny)
        artifact = os.path.join(out_dir, "lora_weight.safetensors")
        assert os.path.exists(artifact), os.listdir(out_dir)
        print("loading artifact in the live reference ...", file=sys.stderr)
        res = _reference_loads(artifact)
        out = {"metric": METRIC, "steps": steps,
               "train_wall_s": round(wall, 1),
               "single_chip": True,
               "target": "800 steps < 120 s on v5e-8 (BASELINE.json); "
                         "wall here includes CLI start + export reload + "
                         "compile on ONE chip",
               **res}
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
