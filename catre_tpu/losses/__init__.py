from .catre_loss import LossConfig, catre_loss
from .pm_loss import pm_loss

__all__ = ["LossConfig", "catre_loss", "pm_loss"]
