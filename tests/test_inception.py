"""Flax InceptionV3: synthetic torchvision-layout state dict converts and
matches the module structure; forward produces (2048,) features."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdance_tpu.metrics.inception_flax import (
    InceptionV3,
    convert_inception_torchvision,
)


def synth_torchvision_sd(flax_params):
    """Generate a torchvision-layout state dict whose conv shapes mirror the
    flax init (inverse of the BN-folding converter, with identity BN)."""
    from flax import traverse_util

    rs = np.random.RandomState(0)
    sd = {}
    flat = traverse_util.flatten_dict(flax_params)
    for path, leaf in flat.items():
        name = ".".join(path[:-1])
        if path[-1] == "kernel" and name != "fc":
            h, w, cin, cout = leaf.shape
            sd[f"{name}.conv.weight"] = rs.randn(cout, cin, h, w).astype(np.float32) * 0.02
            sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{name}.bn.bias"] = rs.randn(cout).astype(np.float32) * 0.01
            sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32) - 1e-3
    sd["fc.weight"] = rs.randn(1000, 2048).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_inception_structure_and_forward():
    model = InceptionV3()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    sd = synth_torchvision_sd(init["params"])
    params = {"params": jax.tree.map(jnp.asarray,
                                     convert_inception_torchvision(sd))}
    from flax import traverse_util

    a = {k: v.shape for k, v in traverse_util.flatten_dict(init["params"]).items()}
    b = {k: v.shape for k, v in traverse_util.flatten_dict(params["params"]).items()}
    assert a == b, (set(a) ^ set(b), )

    pool, logits = model.apply(params, jnp.zeros((1, 299, 299, 3)))
    assert pool.shape == (1, 2048)
    assert logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(pool)).all()

    # identity-BN fold: kernel equals transposed conv weight exactly
    k = np.asarray(params["params"]["Conv2d_1a_3x3"]["kernel"])
    ref = np.transpose(sd["Conv2d_1a_3x3.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(k, ref, rtol=1e-3)

def test_inception_score_cli_end_to_end(tmp_path):
    """--type is through the metrics CLI: synthetic torchvision-layout
    weights -> Flax logits -> finite IS mean/std (ref utils.py:517-531)."""
    import json
    import os

    import torch
    from PIL import Image

    from magicdance_tpu.metrics import center

    model = InceptionV3()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    sd = {k: torch.tensor(v) for k, v in synth_torchvision_sd(init["params"]).items()}
    wpath = tmp_path / "inception.pth"
    torch.save(sd, str(wpath))

    d = tmp_path / "seq" / "gen_images"
    os.makedirs(d)
    os.makedirs(tmp_path / "seq" / "gt_images")
    rs = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"{i}.png")
        Image.fromarray(rs.randint(0, 255, (32, 32, 3), np.uint8)).save(
            tmp_path / "seq" / "gt_images" / f"{i}.png")

    center.main(["--root", str(tmp_path), "--type", "is",
                 "--inception_weights", str(wpath)])
    res = json.load(open(tmp_path / "results.json"))
    assert np.isfinite(res["is_mean"]) and res["is_mean"] >= 1.0
    assert np.isfinite(res["is_std"])


def test_fid_img_sampling(tmp_path):
    """FID-Img (ref metric_center.py:606-618): frame-level FID with only the
    first sample_frames frames per sequence. With sample_frames=0 it must
    equal plain FID; with sampling the feature set changes, so the score
    differs when later frames differ from early ones."""
    import os

    import torch
    from PIL import Image

    from magicdance_tpu.metrics.center import get_all_eval_scores

    model = InceptionV3()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    sd = {k: torch.tensor(v)
          for k, v in synth_torchvision_sd(init["params"]).items()}
    wpath = tmp_path / "inception.pth"
    torch.save(sd, str(wpath))

    rs = np.random.RandomState(2)
    for kind in ("gen_images", "gt_images"):
        d = tmp_path / "seq" / kind
        os.makedirs(d)
        for i in range(6):
            # later frames have a different distribution (bright offset)
            base = rs.randint(0, 128, (32, 32, 3))
            img = base + (120 if i >= 2 and kind == "gen_images" else 0)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                d / f"{i}.png")

    full = get_all_eval_scores(str(tmp_path), ["fid", "fid-img"],
                               inception_weights=str(wpath))
    assert full["fid-img"] == pytest.approx(full["fid"])
    sampled = get_all_eval_scores(str(tmp_path), ["fid-img"],
                                  inception_weights=str(wpath),
                                  sample_frames=2)
    assert np.isfinite(sampled["fid-img"])
    assert abs(sampled["fid-img"] - full["fid-img"]) > 1e-3
