from .vocab import (
    NON_STANDARD_TO_STANDARD,
    THREE_TO_ONE,
    ONE_TO_THREE,
    LETTER_TO_NUM,
    NUM_TO_LETTER,
    AA_PAD_ID,
)
from .featurize import get_coords6d, get_coords6d_jax, featurize_structure
from .dataset import (
    ProteinDataset,
    ProteinProcessedDataset,
    PaddingCollate,
    load_record,
    save_record,
    make_batch,
)
