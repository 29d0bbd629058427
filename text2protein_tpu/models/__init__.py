from .unet import ScoreUNet, build_model
from .utils import get_score_fn, get_sigmas_for_config
