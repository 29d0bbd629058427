from .geometry import build_backbone, random_dihedrals, virtual_cb_from_backbone
from .restraints import inverse_scale, Restraints, restraints_from_maps
from .minimize import run_minimization, minimize_torsions
