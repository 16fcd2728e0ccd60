"""OpenPose CPM nets: converter structure checks + pipeline smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdance_tpu.models.openpose import (
    BODY_TRUNK,
    HAND_FACE_TRUNK,
    BodyPoseNet,
    FacePoseNet,
    HandPoseNet,
    convert_body_pose,
    convert_face_pose,
    convert_hand_pose,
)


def synth_body_sd():
    """Synthetic `body_pose_model.pth`-shaped state dict."""
    rs = np.random.RandomState(0)
    sd = {}

    def add(key, cin, cout, k):
        sd[f"{key}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.02
        sd[f"{key}.bias"] = np.zeros(cout, np.float32)

    cin = 3
    for name, ch, k in BODY_TRUNK:
        if name == "pool":
            continue
        add(f"model0.{name}", cin, ch, k)
        cin = ch
    for branch, out_ch in ((1, 38), (2, 19)):
        chain = [(128, 128, 3), (128, 128, 3), (128, 128, 3), (128, 512, 1),
                 (512, out_ch, 1)]
        for i, (ci, co, k) in enumerate(chain, 1):
            add(f"model1_{branch}.conv5_{i}_CPM_L{branch}", ci, co, k)
        for s in range(2, 7):
            chain = [(185, 128, 7)] + [(128, 128, 7)] * 4 + [(128, 128, 1),
                                                             (128, out_ch, 1)]
            for i, (ci, co, k) in enumerate(chain, 1):
                add(f"model{s}_{branch}.Mconv{i}_stage{s}_L{branch}", ci, co, k)
    return sd


def test_body_conversion_structure_and_forward():
    sd = synth_body_sd()
    params = {"params": jax.tree.map(jnp.asarray, convert_body_pose(sd))}
    net = BodyPoseNet()
    init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    from flax import traverse_util

    a = {k: v.shape for k, v in traverse_util.flatten_dict(init["params"]).items()}
    b = {k: v.shape for k, v in traverse_util.flatten_dict(params["params"]).items()}
    assert a == b
    paf, heat = net.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)


@pytest.mark.parametrize("factory,maps,conv", [
    (HandPoseNet, 22, convert_hand_pose),
    (FacePoseNet, 71, convert_face_pose),
])
def test_hand_face_shapes(factory, maps, conv):
    net = factory()
    out = net.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[0]
    assert out.shape == (1, 8, 8, maps)


def test_detector_smoke_random_weights():
    """Full pipeline with random body weights: runs, returns PoseResult."""
    from magicdance_tpu.data.openpose_detect import OpenposeDetector

    det = OpenposeDetector()
    sd = synth_body_sd()
    det.params["body"] = {"params": jax.tree.map(jnp.asarray, convert_body_pose(sd))}
    img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(np.uint8)
    res = det(img, include_hands=False, include_faces=False)
    assert res.body.ndim == 3 and res.body.shape[1:] == (18, 2)
