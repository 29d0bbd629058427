"""Standalone PC inpainting API.

The reference ships a broken `get_pc_inpainter` (passes `continuous=` kwargs
its update wrappers don't accept, `/root/reference/score_sde_pytorch/
inpainting.py:24-34`); its real inpainting runs through the PC sampler's
conditional-mask path. Here the standalone API is a thin, WORKING wrapper
over the same path: clamp the known region to the (un-noised) reference map
after every corrector and predictor step.
"""

from __future__ import annotations

from .sampling import get_pc_sampler


def get_pc_inpainter(sde, model, shape, predictor="reverse_diffusion",
                     corrector="langevin", snr=0.17, n_steps=1,
                     probability_flow=False, denoise=True, eps=1e-5,
                     num_steps=None):
    """Returns inpainter(params, key, coords_6d, mask_inpaint, context=None,
    context_mask=None) -> (samples, nfe).

    `mask_inpaint`: (B, N, N) bool, True = region to generate; the False
    region is clamped to `coords_6d`.
    """
    sampler = get_pc_sampler(
        sde, model, shape, predictor=predictor, corrector=corrector, snr=snr,
        n_steps=n_steps, probability_flow=probability_flow, denoise=denoise,
        eps=eps, num_steps=num_steps,
    )

    def inpainter(params, key, coords_6d, mask_inpaint, context=None,
                  context_mask=None):
        condition = {
            "inpainting": {"coords_6d": coords_6d, "mask_inpaint": mask_inpaint}
        }
        return sampler(params, key, condition=condition, context=context,
                       context_mask=context_mask)

    return inpainter
