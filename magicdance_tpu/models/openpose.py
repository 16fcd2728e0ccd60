"""OpenPose CPM networks (body PAF+heatmap, hand, face) in Flax.

Rebuild of the reference's detector networks
(ref: model_lib/ControlNet/annotator/openpose/model.py bodypose_model /
handpose_model, face.py FaceNet — standard CMU convolutional-pose-machine
architecture). Needed for the "use your own data" workflow: the pipeline
that pre-renders pose maps for training/inference
(ref README.md:156-185, misc_scripts/detect_openpose_map_tiktok.py).

Converters map the public `body_pose_model.pth` / `hand_pose_model.pth` /
`facenet.pth` torch state dicts onto these modules.

Layer tables (channels, kernel, stride, pad) mirror the CMU nets:
  body: VGG-ish trunk → 128-ch feature F; 6 two-branch stages
        (PAF 38ch / heatmap 19ch), stages 2+ consume cat(L1, L2, F) = 185ch.
  hand: deeper trunk → 128-ch F; stage1 1x1 head → 22 maps; stages 2-6
        consume cat(out, F) = 150ch.
  face: hand-style trunk; 71 maps; stages consume cat(out, F) = 199ch.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv(ch: int, k: int, name: str, dtype=jnp.float32):
    return nn.Conv(ch, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _max_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


# (name, out_ch, kernel) — "pool" entries are 2x2 maxpools
BODY_TRUNK = [
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool", 0, 0),
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool", 0, 0),
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), ("pool", 0, 0),
    ("conv4_1", 512, 3), ("conv4_2", 512, 3),
    ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
]

HAND_FACE_TRUNK = [
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool", 0, 0),
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool", 0, 0),
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), ("pool", 0, 0),
    ("conv4_1", 512, 3), ("conv4_2", 512, 3), ("conv4_3", 512, 3),
    ("conv4_4", 512, 3), ("conv5_1", 512, 3), ("conv5_2", 512, 3),
    ("conv5_3_CPM", 128, 3),
]


def _run_table(x, table, scope_name, module, dtype=jnp.float32):
    pool_i = 0
    for name, ch, k in table:
        if name == "pool":
            x = _max_pool(x)
            pool_i += 1
        else:
            x = _conv(ch, k, f"{scope_name}{name}", dtype)(x)
            x = nn.relu(x)
    return x


class BodyPoseNet(nn.Module):
    """Input (B, H, W, 3) in [-0.5, 0.5]-ish (caffe preprocessing: /256 -
    0.5); outputs (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8, 19))."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = _run_table(x.astype(self.dtype), BODY_TRUNK, "", self, self.dtype)

        def stage1(branch, out_ch):
            h = f
            for i in range(1, 4):
                h = _conv(128, 3, f"conv5_{i}_CPM_L{branch}", self.dtype)(h)
                h = nn.relu(h)
            h = _conv(512, 1, f"conv5_4_CPM_L{branch}", self.dtype)(h)
            h = nn.relu(h)
            return _conv(out_ch, 1, f"conv5_5_CPM_L{branch}", self.dtype)(h)

        l1, l2 = stage1(1, 38), stage1(2, 19)
        for s in range(2, 7):
            inp = jnp.concatenate([l1, l2, f], axis=-1)

            def stage(branch, out_ch, inp=inp, s=s):
                h = inp
                for i in range(1, 6):
                    h = _conv(128, 7, f"Mconv{i}_stage{s}_L{branch}", self.dtype)(h)
                    h = nn.relu(h)
                h = _conv(128, 1, f"Mconv6_stage{s}_L{branch}", self.dtype)(h)
                h = nn.relu(h)
                return _conv(out_ch, 1, f"Mconv7_stage{s}_L{branch}", self.dtype)(h)

            l1, l2 = stage(1, 38), stage(2, 19)
        return l1, l2


class CPMSingleBranch(nn.Module):
    """Hand (22 maps) / face (71 maps) CPM."""

    out_maps: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = _run_table(x.astype(self.dtype), HAND_FACE_TRUNK, "", self, self.dtype)
        h = _conv(512, 1, "conv6_1_CPM", self.dtype)(f)
        h = nn.relu(h)
        out = _conv(self.out_maps, 1, "conv6_2_CPM", self.dtype)(h)
        for s in range(2, 7):
            h = jnp.concatenate([out, f], axis=-1)
            for i in range(1, 6):
                h = _conv(128, 7, f"Mconv{i}_stage{s}", self.dtype)(h)
                h = nn.relu(h)
            h = _conv(128, 1, f"Mconv6_stage{s}", self.dtype)(h)
            h = nn.relu(h)
            out = _conv(self.out_maps, 1, f"Mconv7_stage{s}", self.dtype)(h)
        return out


def HandPoseNet(dtype=jnp.float32) -> CPMSingleBranch:
    return CPMSingleBranch(out_maps=22, dtype=dtype)


def FacePoseNet(dtype=jnp.float32) -> CPMSingleBranch:
    return CPMSingleBranch(out_maps=71, dtype=dtype)


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------

def _cv(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{key}.bias"]}


def convert_body_pose(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """`body_pose_model.pth` (keys model0.conv1_1.* / modelK_B.M*.*) →
    BodyPoseNet tree."""
    out: Dict[str, Any] = {}
    for name, _, _ in BODY_TRUNK:
        if name != "pool":
            out[name] = _cv(sd, f"model0.{name}")
    for branch in (1, 2):
        for i in range(1, 6):
            nm = f"conv5_{i}_CPM_L{branch}"
            out[nm] = _cv(sd, f"model1_{branch}.{nm}")
        for s in range(2, 7):
            for i in range(1, 8):
                nm = f"Mconv{i}_stage{s}_L{branch}"
                out[nm] = _cv(sd, f"model{s}_{branch}.{nm}")
    return out


def convert_hand_pose(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """`hand_pose_model.pth` → CPMSingleBranch(22) tree."""
    out: Dict[str, Any] = {}
    for name, _, _ in HAND_FACE_TRUNK:
        if name != "pool":
            out[name] = _cv(sd, f"model1_0.{name}")
    out["conv6_1_CPM"] = _cv(sd, "model1_1.conv6_1_CPM")
    out["conv6_2_CPM"] = _cv(sd, "model1_1.conv6_2_CPM")
    for s in range(2, 7):
        for i in range(1, 8):
            nm = f"Mconv{i}_stage{s}"
            out[nm] = _cv(sd, f"model{s}.{nm}")
    return out


def convert_face_pose(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """`facenet.pth` (flat attribute keys) → CPMSingleBranch(71) tree."""
    out: Dict[str, Any] = {}
    for name, _, _ in HAND_FACE_TRUNK:
        if name != "pool":
            out[name] = _cv(sd, name)
    out["conv6_1_CPM"] = _cv(sd, "conv6_1_CPM")
    out["conv6_2_CPM"] = _cv(sd, "conv6_2_CPM")
    for s in range(2, 7):
        for i in range(1, 8):
            nm = f"Mconv{i}_stage{s}"
            out[nm] = _cv(sd, nm)
    return out
