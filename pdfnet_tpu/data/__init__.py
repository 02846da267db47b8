from pdfnet_tpu.data.synthetic import SyntheticHandDataset, make_batch  # noqa: F401
