from pdfnet_tpu.models.handnet import HandNet, build_model  # noqa: F401
from pdfnet_tpu.models.csp import CSPNet, build_csp_model   # noqa: F401
