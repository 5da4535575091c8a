"""Direct unit tests for the eval harness (lora_tpu/utils/eval.py —
reference utils.py). The examples exercise evaluate_pipe end-to-end in
--tiny mode; these pin the harness's own math and geometry host-side:
grid tiling placement, alignment-score algebra, prompt templating, and
checkpoint-history ordering. No device work."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from lora_tpu.utils.eval import (
    EXAMPLE_PROMPTS,
    evaluate_pipe,
    image_grid,
    text_img_alignment,
    to_pil,
    visualize_progress,
)


def _solid(r, g, b, size=(8, 8)):
    return Image.fromarray(
        np.full((size[1], size[0], 3), (r, g, b), np.uint8))


def test_example_prompts_match_reference_bank():
    """32 canonical templates, every one carrying the <obj> slot
    (reference utils.py:18-51)."""
    assert len(EXAMPLE_PROMPTS) == 32
    assert all("<obj>" in p for p in EXAMPLE_PROMPTS)
    assert len(set(EXAMPLE_PROMPTS)) == 32


def test_image_grid_places_tiles_row_major():
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    grid = image_grid([_solid(*c) for c in colors], rows=2, cols=2)
    arr = np.asarray(grid)
    assert arr.shape == (16, 16, 3)
    # row-major placement: [r g / b y]
    assert tuple(arr[0, 0]) == colors[0]
    assert tuple(arr[0, 8]) == colors[1]
    assert tuple(arr[8, 0]) == colors[2]
    assert tuple(arr[8, 8]) == colors[3]


def test_image_grid_infers_missing_dims_and_pads_black():
    # 3 images, cols=2 -> rows inferred 2, last tile black
    grid = image_grid([_solid(255, 255, 255)] * 3, cols=2)
    arr = np.asarray(grid)
    assert arr.shape == (16, 16, 3)
    assert (arr[8:, 8:] == 0).all()      # padding tile
    assert (arr[:8, :8] == 255).all()
    # 5 images, no dims -> ceil(sqrt(5)) = 3x3
    assert np.asarray(image_grid([_solid(1, 2, 3)] * 5)).shape == (24, 24, 3)


def test_image_grid_resizes_strays_to_first_size():
    grid = image_grid([_solid(10, 10, 10, size=(8, 8)),
                       _solid(20, 20, 20, size=(16, 4))], rows=1, cols=2)
    assert np.asarray(grid).shape == (8, 16, 3)


def test_to_pil_clips_out_of_range():
    arr = np.array([[[-0.5, 0.0, 0.5], [1.5, 1.0, 0.25]]], np.float32)
    out = np.asarray(to_pil(arr))
    assert out.dtype == np.uint8
    assert tuple(out[0, 0]) == (0, 0, 127)
    assert tuple(out[0, 1]) == (255, 255, 63)


def test_text_img_alignment_algebra():
    torch = pytest.importorskip("torch")
    e1 = torch.tensor([[2.0, 0.0], [0.0, 3.0]])     # normalizes to identity
    text = torch.tensor([[5.0, 0.0], [0.0, 0.1]])   # same directions
    ortho = torch.tensor([[0.0, 1.0], [1.0, 0.0]])  # swapped directions
    out = text_img_alignment(e1, text, ortho)
    # img@text.T over unit vectors = [[1,0],[0,1]] -> mean 0.5
    assert out["text_alignment_avg"] == pytest.approx(0.5)
    assert out["image_alignment_avg"] == pytest.approx(0.5)
    same = text_img_alignment(e1, e1, e1)
    assert same["text_alignment_avg"] == pytest.approx(0.5)
    # fully aligned single row -> exactly 1.0
    one = torch.tensor([[1.0, 1.0]])
    assert text_img_alignment(one, one * 4, one)[
        "text_alignment_avg"] == pytest.approx(1.0)


class _StubPipe:
    """Callable standing in for a pipeline: records prompts, returns a
    deterministic tiny image batch."""

    def __init__(self):
        self.prompts = []
        self.patched = []

    def __call__(self, prompt, **kw):
        self.prompts.append(prompt)
        return np.full((1, 4, 4, 3), 0.5, np.float32)

    def patch_pipe(self, path):
        self.patched.append(path)


def test_evaluate_pipe_templates_and_stats():
    pipe = _StubPipe()
    out = evaluate_pipe(pipe, target_images=[], class_token="dog",
                        learnt_token="<s1>", n_test=3, n_step=2,
                        clip_model_sets=None)
    # generation prompts use the LEARNT token; scoring prompts would use
    # the class token (reference utils.py:131-140)
    assert pipe.prompts == [t.replace("<obj>", "<s1>")
                            for t in EXAMPLE_PROMPTS[:3]]
    assert out["n_images"] == 3
    assert out["gen_mean"] == pytest.approx(127.0, abs=1.0)
    assert out["gen_std"] == pytest.approx(0.0, abs=1e-3)
    assert "text_alignment_avg" not in out  # no CLIP -> stats only


def test_visualize_progress_orders_and_bounds_checkpoints(tmp_path):
    for i in [3, 1, 2, 0]:
        (tmp_path / f"step_{i}.safetensors").write_bytes(b"")
    pipe = _StubPipe()
    imgs = visualize_progress(str(tmp_path / "step_*.safetensors"),
                              "a photo", pipe, offset=1, limit=3)
    # sorted glob, then [offset:limit]
    assert pipe.patched == [str(tmp_path / "step_1.safetensors"),
                            str(tmp_path / "step_2.safetensors")]
    assert len(imgs) == 2 and all(isinstance(im, Image.Image) for im in imgs)
    assert pipe.prompts == ["a photo", "a photo"]
