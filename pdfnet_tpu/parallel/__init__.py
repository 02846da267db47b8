from pdfnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    place_state,
    replicate,
    shard_batch,
    zero1_state_shardings,
)
