from .se import SEBlock  # noqa: F401
from .beta_vae import BetaVAE, BetaVAEModule, model_from_config  # noqa: F401
from .losses import LossSpec, compute_loss, loss_spec_from_config  # noqa: F401
