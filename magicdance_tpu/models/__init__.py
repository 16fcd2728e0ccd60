from magicdance_tpu.models.clip import CLIPTextEncoder
from magicdance_tpu.models.controlnet import PoseControlNet
from magicdance_tpu.models.magicpose import MagicPoseModel
from magicdance_tpu.models.unet import UNet, num_bank_entries
from magicdance_tpu.models.vae import AutoencoderKL
