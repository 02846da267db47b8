from pdfnet_tpu.mano.layer import (  # noqa: F401
    ManoConsts,
    axis_to_rmat,
    load_mano_consts,
    mano_forward,
    pca_to_axis,
    rodrigues,
)
