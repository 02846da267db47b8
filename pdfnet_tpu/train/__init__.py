from pdfnet_tpu.train.loss import LossConsts, compute_loss, eval_outputs, load_loss_consts  # noqa: F401
