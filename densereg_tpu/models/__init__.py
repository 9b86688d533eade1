from densereg_tpu.models.layers import BatchRenorm, ConvBR, Residual
from densereg_tpu.models.hourglass import DenseRegNet, renorm_clip_schedule
from densereg_tpu.models.fold import fold_batch_norm

__all__ = ["BatchRenorm", "ConvBR", "Residual", "DenseRegNet",
           "renorm_clip_schedule", "fold_batch_norm"]
