from layout2img_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    jit_train_step,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "jit_train_step"]
