from magicdance_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    zero1_sharding,
)
