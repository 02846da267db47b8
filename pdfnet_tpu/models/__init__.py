from pdfnet_tpu.models.handnet import HandNet, build_model  # noqa: F401
