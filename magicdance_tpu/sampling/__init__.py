from magicdance_tpu.sampling.ddim import ddim_sample
