from magicdance_tpu.convert.torch_convert import (
    convert_clip_text,
    convert_controlnet,
    convert_magicpose_state,
    convert_unet,
    convert_vae,
    load_torch_state,
)
