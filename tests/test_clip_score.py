"""CLIP-score tests: vision-tower converter parity vs an HF CLIPModel
oracle + folder-scorer smoke (ref: tool/ClipScore.py:9-60 CLIPSimilarity).

Same pattern as the other metric backbones (I3D/ResNet3D/Inception):
build a TINY randomly-initialized torch oracle, convert its state dict
through the first-party converter, and require numerical parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from PIL import Image

from magicdance_tpu.metrics.clip_score import (
    CLIPScorer,
    CLIPVisionEncoder,
    convert_clip_vision,
    preprocess_clip_image,
)


def _tiny_hf_clip():
    """Tiny HF CLIPModel whose vision tower matches CLIPVisionEncoder's
    architecture family (quick_gelu, 4x MLP, pre/post LN, CLS pooling)."""
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu", projection_dim=16,
    )
    text = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, max_position_embeddings=8,
        projection_dim=16,
    )
    cfg = CLIPConfig.from_text_vision_configs(text, vision, projection_dim=16)
    torch.manual_seed(0)
    return CLIPModel(cfg).eval()


def test_vision_converter_parity_vs_hf():
    """convert_clip_vision + CLIPVisionEncoder reproduce HF
    CLIPModel.get_image_features on the same pixels."""
    m = _tiny_hf_clip()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = {"params": jax.tree.map(jnp.asarray, convert_clip_vision(sd))}

    enc = CLIPVisionEncoder(hidden_size=32, num_layers=2, num_heads=2,
                            patch_size=14, projection_dim=16)
    rng = np.random.RandomState(1)
    x = rng.randn(3, 28, 28, 3).astype(np.float32)

    ours = np.asarray(enc.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = m.get_image_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == theirs.shape == (3, 16)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=2e-5)


def test_converter_counts_all_layers():
    m = _tiny_hf_clip()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    tree = convert_clip_vision(sd)
    assert "layer_0" in tree and "layer_1" in tree and "layer_2" not in tree
    assert tree["visual_projection"]["kernel"].shape == (32, 16)
    assert tree["patch_embedding"]["kernel"].shape == (14, 14, 3, 32)


def test_preprocess_clip_image_range():
    img = np.full((10, 12, 3), 128, np.uint8)
    out = preprocess_clip_image(img, size=28)
    assert out.shape == (28, 28, 3)
    # 128/255 under CLIP normalization: channel 0 = (0.502-0.481)/0.269
    np.testing.assert_allclose(out[0, 0, 0], (128 / 255 - 0.48145466) / 0.26862954,
                               atol=1e-6)


def _write_folder(path, seed, n=3):
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            path / f"{i:03d}.png")


def test_folder_scorer_smoke(tmp_path, monkeypatch):
    """CLIPScorer.image_similarity: identical folders score 1.0; different
    folders score strictly less; output is a plain float."""
    # tiny tower so the random-init scorer is fast on CPU
    monkeypatch.setattr(
        CLIPScorer, "__init__",
        lambda self: (
            setattr(self, "vision", CLIPVisionEncoder(
                hidden_size=32, num_layers=1, num_heads=2, patch_size=14,
                projection_dim=16)),
            setattr(self, "params", self.vision.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))),
            setattr(self, "calibrated", False),
            setattr(self, "_embed", jax.jit(self.vision.apply)),
        )[-1],
    )
    a, b = tmp_path / "a", tmp_path / "b"
    _write_folder(a, seed=0)
    _write_folder(b, seed=1)

    import magicdance_tpu.metrics.clip_score as cs

    monkeypatch.setattr(cs, "preprocess_clip_image",
                        lambda img, size=28: preprocess_clip_image(img, 28))
    scorer = CLIPScorer()
    same = scorer.image_similarity(str(a), str(a))
    diff = scorer.image_similarity(str(a), str(b))
    assert isinstance(same, float) and isinstance(diff, float)
    assert same == pytest.approx(1.0, abs=1e-4)
    assert diff < same
