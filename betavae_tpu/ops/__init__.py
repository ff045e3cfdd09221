from .ffl import focal_frequency_loss  # noqa: F401
from .metrics import mse, psnr, ssim, batched_image_metrics  # noqa: F401
from .reparam import reparameterize_and_kl  # noqa: F401
