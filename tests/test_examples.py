"""Execute the examples/ demo scripts end to end (tiny mode).

The notebook-parity demos + the multi-LoRA serving and inpainting demos are
user-facing surface; without these smoke runs they could rot silently while
the suite stays green. Each script's --tiny switch random-inits the CPU unit-test
pipeline (examples/_common.py), so the full argparse -> pipeline -> sampling
-> image-artifact path executes in-process-per-script via subprocess."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lora_files(tmp_path_factory):
    """Two tiny-config unet+text LoRA files (with a TI embed each)."""
    from lora_tpu.core.lora import init_lora, lora_to_pairs
    from lora_tpu.core.sites import (
        text_encoder_lora_sites,
        unet_lora_sites,
    )
    from lora_tpu.formats.safetensors_io import (
        TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
        UNET_DEFAULT_TARGET_REPLACE,
        save_safeloras_with_embeds,
    )
    from lora_tpu.models.config import TINY_TEXT, TINY_UNET

    root = tmp_path_factory.mktemp("example_loras")
    usites = unet_lora_sites(TINY_UNET)
    tsites = text_encoder_lora_sites(TINY_TEXT)
    paths = []
    for n, seed in enumerate((0, 1)):
        lu = init_lora(usites, r=2, rng=jax.random.PRNGKey(seed))
        lt = init_lora(tsites, r=2, rng=jax.random.PRNGKey(seed + 10))
        for lora in (lu, lt):  # non-zero ups so the LoRA changes images
            for i, e in enumerate(sorted(lora["sites"])):
                e = lora["sites"][e]
                e["up"] = e["up"] + 0.02 * (seed + 1)
        emb = np.full((TINY_TEXT.hidden_size,), 0.01 * (n + 1), np.float32)
        p = str(root / f"lora{n}.safetensors")
        save_safeloras_with_embeds(
            {"unet": (lora_to_pairs(lu, usites), UNET_DEFAULT_TARGET_REPLACE),
             "text_encoder": (lora_to_pairs(lt, tsites),
                              TEXT_ENCODER_DEFAULT_TARGET_REPLACE)},
            {f"<s{n}>": emb}, p)
        paths.append(p)
    return paths


def _run(script, *argv):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *argv],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO})
    assert proc.returncode == 0, \
        f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    return proc.stdout


def test_alpha_sweep_runs(lora_files, tmp_path):
    out = str(tmp_path / "sweep.png")
    _run("alpha_sweep.py", "--tiny", "--size", "64", "--steps", "2",
         "--lora", lora_files[0], "--alphas", "0,1.0", "--out", out)
    assert os.path.exists(out)


def test_merge_and_mix_runs(lora_files, tmp_path):
    out = str(tmp_path / "mix.png")
    _run("merge_and_mix.py", "--tiny", "--size", "64", "--steps", "2",
         "--lora_a", lora_files[0], "--lora_b", lora_files[1], "--out", out)
    assert os.path.exists(out)


def test_img2img_lora_runs(lora_files, tmp_path):
    from PIL import Image

    init = str(tmp_path / "init.png")
    Image.fromarray(np.full((64, 64, 3), 90, np.uint8)).save(init)
    out = str(tmp_path / "img2img.png")
    _run("img2img_lora.py", "--tiny", "--size", "64", "--steps", "4",
         "--lora", lora_files[0], "--image", init,
         "--alpha_unet", "0.8", "--alpha_text", "0.5", "--out", out)
    assert os.path.exists(out)


def test_training_progress_runs(lora_files, tmp_path):
    import shutil

    ckpts = tmp_path / "ckpts"
    ckpts.mkdir()
    for i, p in enumerate(lora_files):
        shutil.copy(p, ckpts / f"step_{i}.safetensors")
    out = str(tmp_path / "progress.png")
    _run("training_progress.py", "--tiny", "--size", "64", "--steps", "2",
         "--checkpoints", str(ckpts / "step_*.safetensors"),
         "--prompt", "a <s0> thing", "--out", out)
    assert os.path.exists(out)


def test_serve_multi_lora_runs(lora_files, tmp_path):
    out = str(tmp_path / "multi.png")
    stdout = _run("serve_multi_lora.py", "--tiny", "--size", "64",
                  "--steps", "2", "--loras", ",".join(lora_files),
                  "--prompts", "a dog|a cat", "--route", "0,1", "--out", out)
    assert os.path.exists(out)
    assert "2 prompts across 2 adapters" in stdout


def test_inpaint_lora_runs(lora_files, tmp_path):
    from PIL import Image

    init = str(tmp_path / "photo.png")
    Image.fromarray(np.full((64, 64, 3), 120, np.uint8)).save(init)
    mask = str(tmp_path / "hole.png")
    m = np.zeros((64, 64), np.uint8)
    m[:, 32:] = 255
    Image.fromarray(m).save(mask)
    out = str(tmp_path / "inpaint.png")
    stdout = _run("inpaint_lora.py", "--tiny", "--size", "64", "--steps", "3",
                  "--lora", lora_files[0], "--image", init, "--mask", mask,
                  "--scheduler", "dpm++", "--out", out)
    assert os.path.exists(out)
    assert "latent-blend" in stdout
