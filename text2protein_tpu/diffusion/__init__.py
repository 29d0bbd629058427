from .sde import SDE, VESDE, VPSDE, subVPSDE, get_sde, get_sigmas
from .ema import EMAState, ema_init, ema_update
from .losses import get_sde_loss_fn, block_dropout
from .sampling import get_pc_sampler, get_sampling_fn
from .ode import get_ode_sampler
