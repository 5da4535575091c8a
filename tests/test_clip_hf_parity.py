"""Cross-implementation parity: our JAX CLIP text encoder vs the installed
transformers CLIPTextModel (instantiated from config with random weights —
no downloads needed). This is a true independent oracle for layer math,
masking, activation and final-LN semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from lora_tpu.models.clip import clip_text_forward
from lora_tpu.models.config import CLIPTextConfig


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=500, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = {k: jnp.asarray(v) for k, v in sd.items()
              if not k.endswith("position_ids")}
    ours_cfg = CLIPTextConfig(
        vocab_size=500, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="quick_gelu")
    return model, params, ours_cfg


def test_last_hidden_state_matches(hf_and_ours):
    model, params, cfg = hf_and_ours
    ids = np.array([[499, 5, 17, 230, 42, 498, 498, 498],
                    [499, 88, 3, 499, 9, 11, 12, 498]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip_text_forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_matches_with_longer_batch(hf_and_ours):
    model, params, cfg = hf_and_ours
    rs = np.random.RandomState(1)
    ids = rs.randint(0, 500, (4, 32)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip_text_forward(params, jnp.asarray(ids), cfg))
    assert np.abs(ours - ref).max() < 5e-4
