from gdn_tpu.kernels.fused_loss import fused_loss_terms
from gdn_tpu.kernels.fusion_block import fused_fusion_block
from gdn_tpu.kernels.upsample import fused_upsample_conv
from gdn_tpu.kernels.groupnorm import fused_group_norm_elu
from gdn_tpu.kernels.conv_gn_elu import (
    fused_conv_gn_elu, fused_conv_gn_elu_bt, fused_conv_gn_elu_s2,
)
