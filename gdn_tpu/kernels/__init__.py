from gdn_tpu.kernels.fused_loss import fused_loss_terms
