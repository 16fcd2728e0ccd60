from magicdance_tpu.ops.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_schedule,
    make_schedule,
    q_sample,
    timestep_embedding,
)
from magicdance_tpu.ops.attention import bank_read_attention, dot_product_attention
