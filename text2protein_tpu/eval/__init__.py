from .tmscore import tm_score, kabsch, run_tmalign
from .coords_compare import mse_6d, coord_compare
