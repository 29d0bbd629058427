"""Interop with the PyTorch reference implementation.

`torch_port` converts a reference `UNetModel` checkpoint/state-dict
(`/root/reference/score_sde_pytorch/models/ncsnpp.py:71-263`) into Flax
parameters for `text2protein_tpu.models.ScoreUNet`, enabling (a) migration of
reference-trained checkpoints onto TPU and (b) fp32 numerical-parity testing
against the reference; `torch_state_from_flax_params` is the exact inverse
(TPU-trained weights -> reference-format state dict).
"""

from .torch_port import (
    build_param_mapping,
    flax_params_from_torch_state,
    torch_state_from_flax_params,
)

__all__ = [
    "build_param_mapping",
    "flax_params_from_torch_state",
    "torch_state_from_flax_params",
]
